"""Namespace-qualified table forms (reference: SchemaEntity — the
`ns.table` spelling; bare names resolve when unique, ambiguity is a
bind error like AmbiguousArc)."""

import pytest
import yaml

from htsql_spark import HTSQL, CompileError
from htsql_spark.catalog import Catalog
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def nsdb(spark, tmp_path_factory):
    raw = {
        "tables": {
            # two namespaces; 'region' exists in BOTH → bare spelling
            # is ambiguous, everything else resolves bare
            "region": {"pk": ["r_regionkey"], "prefix": "r_", "namespace": "geo"},
            "region2": None,  # placeholder replaced below
            "nation": {
                "pk": ["n_nationkey"],
                "prefix": "n_",
                "namespace": "geo",
                "links": {"region": {"cols": ["n_regionkey"], "target": "geo.region"}},
            },
            "customer": {
                "pk": ["c_custkey"],
                "prefix": "c_",
                "namespace": "crm",
                "links": {"nation": {"cols": ["c_nationkey"], "target": "nation"}},
            },
        }
    }
    del raw["tables"]["region2"]
    # second 'region' in another namespace, same backing file: yaml
    # keys must be unique, so write it under its declared name via a
    # second catalog entry name — use a distinct decl name but same
    # table name is not expressible in yaml; build the Catalog object
    # directly instead.
    path = tmp_path_factory.mktemp("ns") / "catalog.yaml"
    path.write_text(yaml.safe_dump(raw))
    cat = Catalog.from_yaml(str(path))
    # inject the ambiguous twin: crm.region (same file, other ns)
    from htsql_spark.catalog import TableDef

    twin = TableDef(name="region", pk=("r_regionkey",), prefix="r_", namespace="crm")
    cat.tables[twin.qualified] = twin
    return HTSQL(spark, SF_DIR, catalog=cat)


def test_qualified_scan_and_navigation(nsdb):
    assert len(nsdb.produce("/geo.region")) == 5
    # navigation from a namespaced table follows links as usual
    rows = nsdb.produce("/geo.nation{name, reg := region.name}?n_nationkey=1")
    assert rows[0]["reg"]
    # cross-namespace link (crm.customer → geo-resolved nation)
    rows = nsdb.produce("/crm.customer{name := c_name, nat := nation.name}?c_custkey=1")
    assert rows[0]["nat"]


def test_bare_name_unique_resolves(nsdb):
    # nation exists only in geo → bare spelling still works
    assert len(nsdb.produce("/nation")) == 25
    assert len(nsdb.produce("/customer?c_acctbal > 0")) > 0


def test_bare_name_ambiguous_is_bind_error(nsdb):
    with pytest.raises(CompileError) as ei:
        nsdb.df("/region")
    assert "ambiguous across namespaces" in str(ei.value)
    # qualified forms disambiguate
    assert len(nsdb.produce("/geo.region")) == 5
    assert len(nsdb.produce("/crm.region")) == 5


def test_unknown_table_in_namespace(nsdb):
    with pytest.raises(CompileError) as ei:
        nsdb.df("/geo.customer")
    assert "no table 'customer' in namespace 'geo'" in str(ei.value)


def test_default_catalog_unchanged(db):
    # the shipped catalog stays flat: no namespaces, bare names as ever
    assert db.catalog.namespaces() == set()
    assert len(db.produce("/region")) == 5


def test_dual_fk_reverse_links_both_get_via_names(tmp_path):
    """Two FKs from one origin to the same target: NEITHER reverse
    link keeps the bare name (which fk won used to depend on YAML
    declaration order — reordering links silently changed query
    semantics).  Both traversals live under deterministic _via_
    names; the bare spelling is simply absent (AmbiguousArc spirit:
    no silent choice)."""
    raw = {
        "tables": {
            "customer": {"pk": ["c_custkey"], "prefix": "c_"},
            "orders": {
                "pk": ["o_orderkey"],
                "prefix": "o_",
                "links": {
                    "customer": {"cols": ["o_custkey"], "target": "customer"},
                    "clerk": {"cols": ["o_clerkkey"], "target": "customer"},
                },
            },
        }
    }
    path = tmp_path / "catalog.yaml"
    path.write_text(yaml.safe_dump(raw, sort_keys=False))
    cat = Catalog.from_yaml(str(path))
    links = cat.tables["customer"].links
    assert "orders" not in links
    assert links["orders_via_o_custkey"].target_cols == ("o_custkey",)
    assert links["orders_via_o_clerkkey"].target_cols == ("o_clerkkey",)
    # declaration order must not matter: reversed declaration yields
    # the same link set
    raw["tables"]["orders"]["links"] = {
        "clerk": {"cols": ["o_clerkkey"], "target": "customer"},
        "customer": {"cols": ["o_custkey"], "target": "customer"},
    }
    path.write_text(yaml.safe_dump(raw, sort_keys=False))
    cat2 = Catalog.from_yaml(str(path))
    assert set(cat2.tables["customer"].links) == set(links)
    # a THIRD fk must not silently reclaim the retired bare name
    # (round-10 review: the pop made it available to setdefault again)
    raw["tables"]["orders"]["links"]["referrer"] = {
        "cols": ["o_refkey"], "target": "customer",
    }
    path.write_text(yaml.safe_dump(raw, sort_keys=False))
    cat3 = Catalog.from_yaml(str(path))
    links3 = cat3.tables["customer"].links
    assert "orders" not in links3
    assert links3["orders_via_o_refkey"].target_cols == ("o_refkey",)
    assert set(links3) == set(links) | {"orders_via_o_refkey"}


def test_via_name_collision_is_a_load_error(tmp_path):
    """A computed _via_ reverse-link name colliding with an existing
    link is a NAMED load error, not a silent arc drop (round-10
    ADVICE: setdefault used to discard the reverse traversal)."""
    import yaml as _yaml

    from htsql_spark.catalog import CatalogError

    # (a) an explicitly declared link occupies the via-name the
    # dual-fk relabel needs
    raw = {
        "tables": {
            "customer": {
                "pk": ["c_custkey"],
                "prefix": "c_",
                "links": {
                    "orders_via_o_custkey": {
                        "cols": ["c_ordkey"], "target": "orders",
                    },
                },
            },
            "orders": {
                "pk": ["o_orderkey"],
                "prefix": "o_",
                "links": {
                    "customer": {"cols": ["o_custkey"], "target": "customer"},
                    "clerk": {"cols": ["o_clerkkey"], "target": "customer"},
                },
            },
        }
    }
    path = tmp_path / "catalog.yaml"
    path.write_text(_yaml.safe_dump(raw, sort_keys=False))
    with pytest.raises(CatalogError, match="orders_via_o_custkey"):
        Catalog.from_yaml(str(path))

    # (b) two fks from the same origin with IDENTICAL cols yield the
    # same via-name — previously one traversal silently vanished
    raw["tables"]["customer"]["links"] = {}
    raw["tables"]["orders"]["links"] = {
        "customer": {"cols": ["o_custkey"], "target": "customer"},
        "buyer": {"cols": ["o_custkey"], "target": "customer"},
    }
    path.write_text(_yaml.safe_dump(raw, sort_keys=False))
    with pytest.raises(CatalogError, match="orders_via_o_custkey"):
        Catalog.from_yaml(str(path))
