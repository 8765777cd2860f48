from .parse import parse  # noqa: F401
from . import nodes  # noqa: F401
