"""Multi-catalog gateway mounts (reference: src/htsql/tweak/gateway/
— route a nested query to another mounted database with
``/name(/query)``).  Both catalogs live in one SparkSession here, so
gateway results additionally compose with local operators."""

import pytest

from htsql_spark import HTSQL, CompileError
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def gwdb(spark):
    db = HTSQL(spark, SF_DIR)
    db.attach("tiny", SF_DIR)
    db.attach("mid", "/root/testdata/sf0.01")
    return db


def test_gateway_routes_same_dir(gwdb):
    assert gwdb.produce("/tiny(/region{name})") == gwdb.produce("/region{name}")


def test_gateway_routes_other_dir(gwdb):
    n_local = len(gwdb.produce("/customer"))
    n_mid = len(gwdb.produce("/mid(/customer)"))
    assert n_mid != n_local  # proves the query really ran over sf0.01


def test_gateway_result_composes(gwdb):
    rows = gwdb.produce("/mid(/nation{name, cnt := count(customer)})?cnt > 60")
    assert rows and all(r["cnt"] > 60 for r in rows)


def test_gateway_navigation_inside(gwdb):
    rows = gwdb.produce("/mid(/nation{name}?region.name='ASIA')")
    assert len(rows) == 5


def test_gateway_attach_engine_instance(spark):
    db = HTSQL(spark, SF_DIR)
    other = HTSQL(spark, "/root/testdata/sf0.01", autolimit=3)
    db.attach("lim", other)
    assert len(db.produce("/lim(/customer{c_name})")) == 3


def test_unknown_gateway_is_unknown_function(gwdb):
    with pytest.raises(CompileError) as ei:
        gwdb.df("/nope(/region)")
    assert "unknown function" in str(ei.value)


def test_catalog_declared_gateways(spark, tmp_path):
    """gateways: declared in catalog.yaml attach at engine init
    (reference: tweak.gateway addon config), non-transitively."""
    import yaml

    src = "/root/repo/catalog.yaml"
    with open(src) as f:
        raw = yaml.safe_load(f)
    raw["gateways"] = {"mid": "/root/testdata/sf0.01"}
    cpath = tmp_path / "catalog.yaml"
    cpath.write_text(yaml.safe_dump(raw))

    from htsql_spark.catalog import Catalog

    db = HTSQL(spark, SF_DIR, catalog=Catalog.from_yaml(str(cpath)))
    assert "mid" in db.gateways
    assert len(db.produce("/mid(/region)")) == 5
    # flatness: the attached engine did not re-attach anything
    assert db.gateways["mid"].gateways == {}


def test_attach_rejects_builtin_shadowing(db):
    """A gateway named like a builtin would shadow the builtin for
    one-argument calls (gateway dispatch runs first) — rejected at
    attach time."""
    for bad in ("sort", "top", "count", "round", "meta"):
        with pytest.raises(ValueError):
            db.attach(bad, "/root/testdata/sf0.01")
    assert "sort" not in db.gateways


def test_attach_validates_dir_against_catalog(db, tmp_path):
    """Mounting a directory that lacks the assumed catalog's tables is
    an attach-time error, not a silent misdeclaration."""
    (tmp_path / "somedata.parquet").write_bytes(b"")
    with pytest.raises(ValueError) as ei:
        db.attach("odd", str(tmp_path))
    assert "no source files" in str(ei.value)
    # an explicit schema-less catalog for the same dir is accepted
    from htsql_spark.catalog import Catalog

    db.attach("odd2", "/root/testdata/sf0.01", catalog=Catalog.from_files("/root/testdata/sf0.01"))
    assert len(db.produce("/odd2(/region)")) == 5


def test_catalog_gateway_with_own_catalog(spark, tmp_path):
    """gateways: entries may carry their own catalog yaml
    ({dir, catalog}) for differently-shaped mounted data."""
    import yaml

    src = "/root/repo/catalog.yaml"
    with open(src) as f:
        raw = yaml.safe_load(f)
    # sub-catalog describing only region (a 'differently-shaped' dir
    # that happens to be a subset)
    sub = {"tables": {"region": {"pk": ["r_regionkey"], "prefix": "r_"}}}
    subpath = tmp_path / "sub.yaml"
    subpath.write_text(yaml.safe_dump(sub))
    raw["gateways"] = {"mini": {"dir": "/root/testdata/sf0.01", "catalog": str(subpath)}}
    cpath = tmp_path / "catalog.yaml"
    cpath.write_text(yaml.safe_dump(raw))

    from htsql_spark.catalog import Catalog

    db = HTSQL(spark, SF_DIR, catalog=Catalog.from_yaml(str(cpath)))
    assert len(db.produce("/mini(/region)")) == 5
    with pytest.raises(Exception):
        db.produce("/mini(/customer)")  # not in the sub-catalog


def test_gateway_own_autolimit_applies_inside(spark):
    """Per-gateway service config (reference: each gateway is an
    independent catalog+connection): a gateway mounted with its own
    autolimit truncates ITS results before they surface as a local
    flow — and the local engine's (absent) autolimit does not undo
    or double-apply it."""
    from htsql_spark import HTSQL
    from tests.conftest import SF_DIR

    inner = HTSQL(spark, SF_DIR, autolimit=3)
    db = HTSQL(spark, SF_DIR)
    db.attach("lim", inner)
    assert len(db.produce("/lim(/nation)")) == 3
    # composition on top of the truncated gateway flow still works
    rows = db.produce("/lim(/nation)?n_nationkey >= 0")
    assert len(rows) <= 3


def test_gateway_reattach_replaces(spark, tmp_path):
    """Re-attaching an existing gateway name REPLACES the mount (the
    documented semantics — a stale mount must not linger behind a
    name the user has rebound)."""
    import pandas as pd

    from htsql_spark import HTSQL
    from htsql_spark.catalog import Catalog
    from tests.conftest import SF_DIR

    d = tmp_path / "alt"
    d.mkdir()
    pd.DataFrame({"x": [1, 2]}).to_parquet(str(d / "things.parquet"))
    db = HTSQL(spark, SF_DIR)
    db.attach("alt", SF_DIR)
    assert len(db.produce("/alt(/region)")) == 5
    db.attach("alt", str(d), catalog=Catalog.from_files(str(d)))
    assert len(db.produce("/alt(/things)")) == 2


def test_gateway_scalar_and_format_pipe(gwdb):
    """Gateway sub-queries accept any legal query (a scalar is a
    1-row flow), and a format pipe on the OUTER query renders the
    gateway result."""
    rows = gwdb.produce("/mid(/2+2)")
    assert len(rows) == 1 and list(rows[0].values()) == [4]
    body = gwdb.emit("/mid(/region)/:csv")
    assert body.startswith(b"r_regionkey")
