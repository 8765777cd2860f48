"""htsql_spark — a PySpark-native analytics engine with the query
capabilities of HTSQL (navigational queries over a schema graph),
built Spark-first: the language front-end produces DataFrame plans and
Catalyst/Tungsten own all physical optimization.

Reference for semantics (NOT architecture):
prometheusresearch/htsql 2.3.3 — see SURVEY.md.
"""

from .catalog import Catalog, CatalogError  # noqa: F401
from .engine import HTSQL, get_spark  # noqa: F401
from .ir import CompileError  # noqa: F401
from .wsgi import WSGI  # noqa: F401

__version__ = "0.1.0"
