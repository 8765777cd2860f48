import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from htsql_spark import get_spark

    s = get_spark("htsql-spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def db(spark):
    from htsql_spark import HTSQL

    return HTSQL(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle mirroring the driver's t2 comparison."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: full-registry tier (non-gated replay/hygiene rows) — "
        "excluded by the smoke run `pytest tests -m 'not full'`",
    )
