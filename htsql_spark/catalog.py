"""Catalog: the schema-graph metadata layer.

Spark's own catalog has no notion of primary keys, unique keys, or
foreign keys; the navigational query language needs all three (they
drive link traversal, identity literals and the implicit ordering
contract).  The reference engine introspects them from the backing
RDBMS (reference: src/htsql/core/entity.py::CatalogEntity,
src/htsql/core/introspect.py::Introspect); here they are *declared*
in ``catalog.yaml`` and carried as a driver-side side-channel next to
the parquet schemas.

Link naming follows the reference's classify rule (reference:
src/htsql/core/classify.py::classify / ::relabel):

* a declared FK gives a **singular** link (many→one), named after the
  target table;
* every FK also induces a **reverse plural** link (one→many) on the
  target table, named after the origin table.

In addition each table may declare a column ``prefix`` (TPC-H style
``n_``/``c_`` …): stripping it yields friendly attribute aliases, so
``nation.name`` resolves to column ``n_name``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


# directory-name suffixes the sinks and maintenance passes create as
# SIBLINGS of a dataset (staging, backups, checkpoints, bucket
# metadata) — landing-mount discovery skips exactly these, nothing
# else, so a user table legitimately named e.g. user__events mounts
_INTERNAL_SUFFIXES = (
    "__epochs", "__epoch", "__preswap", "__presnap", "__staging",
    "__checkpoint", "__compacting", "__precompact", "__lock",
    "__buckets", "__bstage", "__bback",
)


class CatalogError(ValueError):
    """A malformed or ambiguous catalog declaration — raised at load
    time so the mount fails loudly instead of a traversal silently
    vanishing (the same rationale as the bare-name retirement below:
    which arc survives a name collision must never depend on YAML
    declaration order)."""


@dataclass(frozen=True)
class Link:
    """A navigable arc between two tables (reference:
    src/htsql/core/model.py::ChainArc)."""

    name: str
    origin: str
    target: str
    origin_cols: tuple[str, ...]
    target_cols: tuple[str, ...]
    is_singular: bool  # many→one (FK holder side) vs one→many reverse

    @property
    def is_plural(self) -> bool:
        return not self.is_singular


@dataclass
class TableDef:
    name: str
    pk: tuple[str, ...]
    prefix: str = ""
    columns: tuple[str, ...] = ()  # filled from parquet schema at load
    links: dict[str, Link] = field(default_factory=dict)
    #: columns forming the table's *identity* — what locators
    #: ``table[...]`` match and ``id()`` serializes (reference:
    #: src/htsql/core/domain.py::IdentityDomain).  Defaults to the
    #: primary key; a table may declare an alternate unique key (e.g.
    #: region's text name) so quoted-text locators ``/region['ASIA']``
    #: work.  The PK keeps driving the implicit ordering contract.
    identity: tuple[str, ...] = ()
    #: name of a registered derived-table builder (see
    #: htsql_spark.derived): the table has no backing file and is
    #: built as a DataFrame plan from other catalog tables.  Empty →
    #: a regular file-backed table.
    derived: str = ""
    #: namespace (reference: src/htsql/core/entity.py::SchemaEntity).
    #: Empty = the default namespace.  A namespaced table is addressed
    #: ``/ns.table``; the bare ``/table`` spelling still resolves when
    #: the name is unique across namespaces (ambiguity is a bind
    #: error, reference AmbiguousArc).
    namespace: str = ""
    #: stream-mounted: the table's backing directory is ALSO a valid
    #: Structured Streaming file source (a landing directory in a real
    #: deployment).  Engine.df_stream() compiles queries over such a
    #: table against readStream scans, so the same language query can
    #: execute as a stream (availableNow drain or a live trigger) —
    #: the execution-mode bridge on top of the batch-twin semantics
    #: (SURVEY §3.6, beyond-reference surface).  Batch scans are
    #: unaffected.
    stream: bool = False

    @property
    def qualified(self) -> str:
        return f"{self.namespace}.{self.name}" if self.namespace else self.name

    @property
    def identity_cols(self) -> tuple[str, ...]:
        return self.identity or self.pk

    def alias_of(self, attr: str) -> str | None:
        """Friendly attribute name → physical column (prefix-stripped)."""
        if self.prefix and not attr.startswith(self.prefix):
            cand = self.prefix + attr
            if cand in self.columns:
                return cand
        return None


class Catalog:
    def __init__(
        self, tables: dict[str, TableDef], gateways: dict[str, str] | None = None
    ):
        self.tables = tables
        #: declared gateway mounts: name → data directory (reference:
        #: src/htsql/tweak/gateway/ configures gateways in the addon
        #: config the same way); attached by the engine at init.
        self.gateways = gateways or {}

    @classmethod
    def from_yaml(cls, path: str | None = None) -> "Catalog":
        import yaml

        if path is None:
            path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "catalog.yaml")
            if not os.path.exists(path):
                path = os.path.join(os.getcwd(), "catalog.yaml")
        with open(path) as f:
            raw = yaml.safe_load(f)
        tables: dict[str, TableDef] = {}
        keys: dict[str, str] = {}  # declared name → catalog key
        for tname, spec in raw["tables"].items():
            ns = spec.get("namespace", "") or ""
            td = TableDef(
                name=tname,
                pk=tuple(spec["pk"]),
                prefix=spec.get("prefix", "") or "",
                identity=tuple(spec.get("identity") or ()),
                derived=spec.get("derived", "") or "",
                namespace=ns,
                stream=bool(spec.get("stream", False)),
            )
            tables[td.qualified] = td
            keys[tname] = td.qualified
        # second pass: links + reverse links (targets may be spelled
        # bare or namespace-qualified)
        retired: set[tuple[str, str]] = set()  # (tkey, bare) → _via_ only
        for tname, spec in raw["tables"].items():
            okey = keys[tname]
            for lname, lspec in (spec.get("links") or {}).items():
                target = lspec["target"]
                tkey = target if target in tables else keys[target]
                cols = tuple(lspec["cols"])
                tcols = tuple(lspec.get("target_cols") or tables[tkey].pk)
                fwd = Link(lname, okey, tkey, cols, tcols, is_singular=True)
                tables[okey].links[lname] = fwd
                rname = tables[okey].name
                if (tkey, rname) in retired:
                    # a THIRD (or later) fk to the same target: the
                    # bare name is already retired — it must not be
                    # silently reclaimed (setdefault below would)
                    rname = f"{tables[okey].name}_via_{'_'.join(cols)}"
                elif rname in tables[tkey].links:
                    # a SECOND fk from the same origin to this target
                    # (orders.o_custkey and orders.o_clerkkey both →
                    # customer): BOTH reverse links go under _via_
                    # names — if the first-declared fk silently kept
                    # the bare name, which fk wins would depend on
                    # YAML declaration order, and reordering links
                    # would silently change query semantics.  The
                    # bare name becomes unavailable (the reference's
                    # AmbiguousArc → bind-error-on-use spirit).
                    prev = tables[tkey].links.pop(rname)
                    # only relabel a true twin (another REVERSE link
                    # of the same fk pair) — a forward link of tkey
                    # that happens to share the name keeps its slot
                    if prev.target == okey and not prev.is_singular:
                        pname = f"{rname}_via_{'_'.join(prev.target_cols)}"
                        if tables[tkey].links.get(pname, prev) is not prev:
                            # the computed _via_ name collides with an
                            # explicitly declared link (or two fks from
                            # the same origin share identical cols):
                            # dropping either arc silently is the same
                            # loss class the bare-name retirement
                            # exists to prevent — fail the load
                            raise CatalogError(
                                f"reverse link name {pname!r} on table"
                                f" {tkey!r} collides with an existing"
                                " link — rename the declared link or"
                                " adjust the fk columns"
                            )
                        tables[tkey].links[pname] = prev
                        retired.add((tkey, rname))
                    else:
                        tables[tkey].links[rname] = prev
                    rname = f"{tables[okey].name}_via_{'_'.join(cols)}"
                rev = Link(rname, tkey, okey, tcols, cols, is_singular=False)
                if "_via_" in rname and rname in tables[tkey].links:
                    raise CatalogError(
                        f"reverse link name {rname!r} on table {tkey!r}"
                        " collides with an existing link — rename the"
                        " declared link or adjust the fk columns"
                    )
                tables[tkey].links.setdefault(rname, rev)
        return cls(tables, gateways=dict(raw.get("gateways") or {}))

    # -- namespace-aware resolution ------------------------------------
    def namespaces(self) -> set[str]:
        return {t.namespace for t in self.tables.values() if t.namespace}

    def resolve(self, name: str):
        """Resolve a (possibly bare) table name to its catalog key.
        Returns None when unknown; raises on a bare name that exists
        in several namespaces (reference: AmbiguousArc → bind error
        on use)."""
        if name in self.tables:
            return name
        hits = [k for k, t in self.tables.items() if t.name == name]
        if len(hits) > 1:
            from .ir import CompileError

            raise CompileError(
                f"table name '{name}' is ambiguous across namespaces"
                f" ({', '.join(sorted(hits))}) — qualify it as ns.table"
            )
        return hits[0] if hits else None

    def in_namespace(self, ns: str, name: str):
        key = f"{ns}.{name}"
        return key if key in self.tables else None

    @classmethod
    def from_files(cls, data_dir: str) -> "Catalog":
        """Reflect a catalog from the data files in a directory — the
        reference's ``tweak.filedb`` posture (reference:
        src/htsql/tweak/filedb/): every ``*.parquet``/``*.csv``/
        ``*.json``/``*.orc``/``*.txt`` file is a table; no PKs or
        FKs are assumed, so
        navigation links are unavailable but scans, selections,
        filters, quotients and functions all work."""
        tables: dict[str, TableDef] = {}
        for fn in sorted(os.listdir(data_dir)):
            base, ext = os.path.splitext(fn)
            if ext in (".parquet", ".csv", ".json", ".orc", ".txt") and base not in tables:
                tables[base] = TableDef(name=base, pk=())
            elif (
                ext == ""
                and not fn.endswith(_INTERNAL_SUFFIXES)
                and fn not in tables
                and os.path.isdir(os.path.join(data_dir, fn))
                and any(
                    g.endswith(".parquet")
                    for g in os.listdir(os.path.join(data_dir, fn))
                )
            ):
                # directory landing mount: {name}/ with accumulated
                # parquet files (a streaming landing zone).  Only the
                # KNOWN sink/maintenance suffixes are internal — a
                # substring test on "__" would silently unmount a
                # legitimately named dir like user__events (round-12
                # advice)
                tables[fn] = TableDef(name=fn, pk=())
        return cls(tables)

    def __getitem__(self, name: str) -> TableDef:
        return self.tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.tables
