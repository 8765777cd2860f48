"""Engine: the public entry point.

Mirrors the reference's application / produce API (reference:
src/htsql/__init__.py::HTSQL, src/htsql/core/cmd/act.py::produce /
::render) with Spark underneath:

    db = HTSQL(spark, '/root/testdata/sf0.01')
    df = db.df("/nation{name, count(customer)}?region.name='ASIA'")
    rows = db.produce("/region")          # list[dict]
    body = db.emit("/region", 'json')     # formatted bytes

Tables are parquet files under ``data_dir`` (the generalization of the
reference's ``tweak.filedb`` CSV mount — reference:
src/htsql/tweak/filedb/); the schema graph comes from catalog.yaml.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .compile import Compiler
from .ir import CompileError, Flow
from .parquet_ts import convert_nano_cols, nano_timestamp_fields
from .syntax import parse
from .syntax import nodes as N

#: fixed-cardinality dimension tables — always broadcast in joins
BROADCAST_TABLES = {"region", "nation"}

#: output format pipes handled at the command layer
FORMAT_NAMES = {"json", "csv", "tsv", "txt", "raw", "html", "xml"}


class HTSQL:
    def __init__(
        self,
        spark: SparkSession,
        data_dir: str,
        catalog: Catalog | None = None,
        autolimit: int | None = None,
        timeout: float | None = None,
        ordered: bool = False,
    ):
        self.spark = spark
        self.data_dir = data_dir.rstrip("/")
        self.catalog = catalog or Catalog.from_yaml()
        # validated up front with named errors (reference: the tweak
        # addons validate their parameters at configure time — a bad
        # limit must not surface later as an opaque Spark error on
        # the first query)
        if autolimit is not None and (
            not isinstance(autolimit, int)
            or isinstance(autolimit, bool)
            or autolimit < 1
        ):
            raise ValueError(
                f"autolimit must be a positive integer or None, got"
                f" {autolimit!r} (reference: tweak.autolimit's limit"
                " parameter)"
            )
        if timeout is not None and (
            not isinstance(timeout, (int, float))
            or isinstance(timeout, bool)
            or timeout <= 0
        ):
            raise ValueError(
                f"timeout must be a positive number of seconds or None,"
                f" got {timeout!r} (reference: tweak.timeout's timeout"
                " parameter)"
            )
        self.autolimit = autolimit  # reference: src/htsql/tweak/autolimit/
        self.timeout = timeout  # reference: src/htsql/tweak/timeout/
        #: reference-parity output ordering: the reference ALWAYS
        #: emits rows in the implicit order (PK / kernel / sort keys).
        #: Off by default here — a global sort on every 100 TB result
        #: is the wrong default on Spark, and order-sensitive
        #: boundaries (limit/top/nested collect) already materialize
        #: their order.  ordered=True restores full parity for
        #: regress-style consumers.
        self.ordered = ordered
        self.last_format: str | None = None  # format used by last emit()
        self.broadcast_tables = BROADCAST_TABLES
        self._counter = itertools.count()
        self._tables: dict[str, DataFrame] = {}
        #: stream-execution compile mode (df_stream): while set,
        #: stream-mounted tables scan via readStream; plain tables
        #: still scan batch (stream-batch joins are legal and the
        #: batch side is broadcast/state-joined by Spark).  THREAD-
        #: LOCAL: one engine is documented as safely shareable by a
        #: concurrent WSGI server, so a df_stream compile on one
        #: thread must never flip another thread's batch compile
        #: into streaming scans (round-11 review).
        import threading

        self._stream_mode = threading.local()
        self._stream_tables: dict[str, DataFrame] = {}
        #: named secondary engines (reference: src/htsql/tweak/gateway/
        #: — route a nested query to another mounted database)
        self.gateways: dict[str, "HTSQL"] = {}
        self._fill_columns()
        # catalog-declared gateway mounts are FLAT (a gateway's own
        # declared gateways are ignored — no transitive/cyclic mounts).
        # A mount is either a plain directory string (assumes the
        # default catalog — validated against the dir's files at
        # attach) or {dir: ..., catalog: ...} with its own catalog
        # yaml for differently-shaped data.
        for gname, gspec in self.catalog.gateways.items():
            if isinstance(gspec, dict):
                gdir = gspec["dir"]
                sub_cat = Catalog.from_yaml(gspec["catalog"]) if gspec.get(
                    "catalog"
                ) else None
            else:
                gdir, sub_cat = gspec, None
            if sub_cat is None:
                sub_cat = Catalog.from_yaml()
            sub_cat.gateways = {}
            self.attach(gname, gdir, catalog=sub_cat)

    # -- catalog / io --------------------------------------------------
    def _fill_columns(self) -> None:
        for name, tdef in self.catalog.tables.items():
            if not tdef.columns:
                tdef.columns = tuple(self.table(name).columns)

    def table(self, name: str) -> DataFrame:
        """Raw table scan, cached per engine.  Sources, probed in
        order: ``{name}.parquet`` (primary), ``{name}.csv``,
        ``{name}.json``, ``{name}.orc``, ``{name}.txt`` (raw lines)
        — the generalization of the reference's
        ``tweak.filedb`` CSV-directory mount (reference:
        src/htsql/tweak/filedb/).  TIMESTAMP(NANOS) parquet columns
        (which the JVM reader refuses) are read as nano longs
        (``spark.sql.legacy.parquet.nanosAsLong``) and converted to
        timestamps at the scan."""
        if getattr(self._stream_mode, "on", False):
            tdef = self.catalog.tables.get(name)
            if tdef is not None and tdef.stream:
                return self.table_stream(name)
        if name not in self._tables:
            import os

            tdef = self.catalog.tables.get(name)
            if tdef is not None and tdef.derived:
                from .derived import BUILDERS

                self._tables[name] = BUILDERS[tdef.derived](self)
                return self._tables[name]
            # namespaced tables are keyed 'ns.name' in the catalog but
            # backed by their bare file name (one flat directory; a
            # real multi-schema mount is a gateway per directory)
            fname = tdef.name if tdef is not None else name
            pq = f"{self.data_dir}/{fname}.parquet"
            pqdir = f"{self.data_dir}/{fname}"
            if os.path.exists(pq):
                df = self.spark.read.parquet(pq)
                df = convert_nano_cols(df, nano_timestamp_fields(pq))
            elif os.path.isdir(pqdir) and any(
                f.endswith(".parquet") for f in os.listdir(pqdir)
            ):
                # directory landing mount: {name}/ accumulating many
                # parquet files (the streaming landing-zone shape —
                # micro-batches append files, batch queries read the
                # whole directory).  The nano-timestamp contract
                # assumes HOMOGENEOUS writers (every file agrees on
                # which columns are TIMESTAMP(NANOS)); that contract
                # is VALIDATED by probing the first/middle/last
                # footers — a dir mixing nano and non-nano physical
                # types for the same column fails loudly here instead
                # of silently mis-converting part of the data
                # (round-12 advice).  The file listing is frozen when
                # the table is first resolved (standard Spark
                # file-index behavior) — for files landed later,
                # construct a fresh engine or query the stream mount,
                # which discovers new files per micro-batch
                names = sorted(
                    f for f in os.listdir(pqdir) if f.endswith(".parquet")
                )
                probes = sorted({names[0], names[len(names) // 2], names[-1]})
                fields = nano_timestamp_fields(f"{pqdir}/{probes[0]}")
                for other in probes[1:]:
                    got = nano_timestamp_fields(f"{pqdir}/{other}")
                    if got != fields:
                        raise ValueError(
                            f"landing mount {pqdir}: heterogeneous"
                            " parquet timestamp physical types —"
                            f" {probes[0]} has nano columns {fields}"
                            f" but {other} has {got}; the directory"
                            " mount requires homogeneous writers"
                        )
                df = self.spark.read.parquet(pqdir)
                df = convert_nano_cols(df, fields)
            elif os.path.exists(f"{self.data_dir}/{fname}.csv"):
                df = self.spark.read.csv(
                    f"{self.data_dir}/{fname}.csv", header=True, inferSchema=True
                )
            elif os.path.exists(f"{self.data_dir}/{fname}.json"):
                df = self.spark.read.json(f"{self.data_dir}/{fname}.json")
            elif os.path.exists(f"{self.data_dir}/{fname}.orc"):
                df = self.spark.read.orc(f"{self.data_dir}/{fname}.orc")
            elif os.path.exists(f"{self.data_dir}/{fname}.txt"):
                # raw text: one row per line, in-file line order
                df = self.spark.read.text(f"{self.data_dir}/{fname}.txt").select(
                    F.col("value").alias("line")
                )
            else:
                raise KeyError(f"no source file for table {name!r} in {self.data_dir}")
            self._tables[name] = df
        return self._tables[name]

    def table_stream(self, name: str) -> DataFrame:
        """Streaming scan of a stream-mounted table (catalog
        ``stream: true``): a readStream file source over the table's
        backing directory with the SAME column contract as the batch
        scan (nano-timestamp conversion included), except zone-less
        timestamps are cast TIMESTAMP so they are watermark-eligible
        (wall clock preserved under the UTC session — batch oracles
        agree).  Plans are cached per engine like batch scans."""
        if name not in self._stream_tables:
            tdef = self.catalog.tables.get(name)
            if tdef is None or not tdef.stream:
                raise CompileError(
                    f"table {name!r} is not stream-mounted — declare"
                    " `stream: true` in catalog.yaml to expose it as a"
                    " Structured Streaming source"
                )
            if tdef.derived:
                raise CompileError(
                    f"derived table {name!r} cannot be stream-mounted"
                    " (it has no backing landing directory)"
                )
            from .streaming.events import read_table_stream

            self._stream_tables[name] = read_table_stream(
                self.spark, self.data_dir, tdef.name
            )
        return self._stream_tables[name]

    def fresh(self, prefix: str) -> str:
        return f"{prefix}{next(self._counter)}"

    def scan_df(self, name: str, alias: str) -> DataFrame:
        df = self.table(name)
        return df.select(*[F.col(c).alias(f"{alias}__{c}") for c in df.columns])

    def scan_flow(self, name: str) -> Flow:
        alias = self.fresh("t")
        flow = Flow(self, self.scan_df(name, alias), alias, self.catalog[name])
        flow.order = [(f"{alias}__{c}", True) for c in self.catalog[name].pk]
        return flow

    def unit_df(self) -> DataFrame:
        return self.spark.range(1).drop("id")

    def meta_df(self, kind: str) -> DataFrame:
        """Catalog-as-data (reference: src/htsql/tweak/meta/ — the
        /meta() command): 'table' | 'column' | 'link' DataFrames."""
        if kind == "table":
            rows = [
                (t.name, ".".join(t.pk), ".".join(t.identity_cols), len(t.columns))
                for t in self.catalog.tables.values()
            ]
            return self.spark.createDataFrame(
                rows, "name string, pk string, identity string, n_columns int"
            )
        if kind == "column":
            rows = []
            # keys, not bare names: a namespaced table's catalog key is
            # 'ns.name' — a bare-name lookup would miss the TableDef
            # (crashing derived tables) and cache a duplicate DataFrame
            for key, t in self.catalog.tables.items():
                df = self.table(key)
                for f in df.schema.fields:
                    rows.append(
                        (t.name, f.name, f.dataType.simpleString(), f.nullable, f.name in t.pk)
                    )
            return self.spark.createDataFrame(
                rows, "table string, name string, type string, nullable boolean, is_pk boolean"
            )
        if kind == "link":
            rows = []
            for t in self.catalog.tables.values():
                for link in t.links.values():
                    rows.append(
                        (
                            link.origin,
                            link.name,
                            link.target,
                            "singular" if link.is_singular else "plural",
                            ",".join(link.origin_cols),
                        )
                    )
            return self.spark.createDataFrame(
                rows, "origin string, name string, target string, kind string, via string"
            )
        raise ValueError(f"unknown meta kind {kind!r} (use table|column|link)")

    def home_flow(self) -> Flow:
        flow = Flow(self, self.unit_df(), "", None)
        flow.is_home = True
        return flow

    # -- gateways (multi-catalog mounts) -------------------------------
    def attach(
        self,
        name: str,
        target: "str | HTSQL",
        catalog: Catalog | None = None,
    ) -> "HTSQL":
        """Mount a second data directory (or an existing engine) as a
        named gateway (reference: src/htsql/tweak/gateway/ — each
        gateway is an independent catalog+connection; queries route
        with ``/name(/query)``).  Unlike the reference, both catalogs
        live in one SparkSession, so gateway results are ordinary
        DataFrames."""
        from .compile import FLOW_METHODS
        from . import functions as fnlib

        low = name.lower()
        if low == "meta" or low in FLOW_METHODS or low in fnlib.AGGREGATES or (
            low in fnlib.SCALARS
        ):
            # a gateway named like a builtin would shadow it for
            # single-argument calls (gateway dispatch runs first)
            raise ValueError(
                f"gateway name {name!r} collides with a builtin"
                " function/flow method — pick another name"
            )
        if isinstance(target, HTSQL):
            gw = target
        else:
            cat = catalog or Catalog.from_yaml()
            # the declared catalog is an ASSUMPTION about the mounted
            # directory: verify every file-backed table has a source
            # file now, instead of misdeclaring tables until first
            # query against a differently-shaped dir
            import os

            tdir = target.rstrip("/")
            missing = [
                t.name
                for t in cat.tables.values()
                if not t.derived
                and not any(
                    os.path.exists(f"{tdir}/{t.name}.{ext}")
                    for ext in ("parquet", "csv", "json", "orc", "txt")
                )
            ]
            if missing:
                raise ValueError(
                    f"gateway {name!r}: data dir {target!r} has no source"
                    f" files for catalog tables {missing} — pass a catalog"
                    " matching the directory (e.g. Catalog.from_files(dir)"
                    " for schema-less scans, or a per-gateway catalog"
                    " yaml in the gateways: section)"
                )
            gw = HTSQL(self.spark, target, catalog=cat)
        self.gateways[name] = gw
        return gw

    # -- query API -----------------------------------------------------
    def df(self, query: str) -> DataFrame:
        """Compile query text → DataFrame (no action triggered)."""
        node = parse(query)
        fmt, node = self._strip_format(node)
        df = Compiler(self).compile_query(node)
        if self.autolimit:
            df = df.limit(self.autolimit)
        return df

    def _strip_format(self, node: N.Node):
        inner = node.op if isinstance(node, N.Segment) else node
        if isinstance(inner, N.Apply) and inner.name.lower() in FORMAT_NAMES and len(inner.args) == 1:
            return inner.name.lower(), (
                N.Segment(inner.args[0]) if isinstance(node, N.Segment) else inner.args[0]
            )
        return None, node

    def produce(self, query: str) -> list[dict]:
        """Execute and return rows as plain dicts (nested lists/records
        included).  Honors ``timeout`` (reference:
        src/htsql/tweak/timeout/ — statement execution deadline)."""
        df = self.df(query)
        if not self.timeout:
            return [row.asDict(recursive=True) for row in df.collect()]
        import threading

        sc = self.spark.sparkContext
        group = self.fresh("htsql_timeout_")
        fired = threading.Event()
        done = threading.Event()

        def _watchdog():
            if done.wait(self.timeout):
                return
            fired.set()
            # cancelJobGroup only kills jobs active at call time; keep
            # cancelling so jobs submitted after the deadline (e.g.
            # while the driver was still planning) die too
            while not done.wait(0.1):
                sc.cancelJobGroup(group)

        sc.setJobGroup(group, f"produce with {self.timeout}s timeout", True)
        watchdog = threading.Thread(target=_watchdog, daemon=True)
        watchdog.start()
        try:
            return [row.asDict(recursive=True) for row in df.collect()]
        except Exception as exc:
            if fired.is_set():
                raise TimeoutError(
                    f"query exceeded timeout of {self.timeout}s"
                ) from exc
            raise
        finally:
            done.set()
            sc.setJobGroup("", "")

    def emit(self, query: str, fmt: str | None = None) -> bytes:
        """Render a query in an output format (reference:
        src/htsql/core/fmt/emit.py::emit)."""
        return self.emit_with_format(query, fmt)[0]

    def emit_with_format(
        self, query: str, fmt: str | None = None
    ) -> tuple[bytes, str]:
        """emit() plus the format actually used — the race-free way
        for a concurrent server to pick its Content-Type (reading
        ``last_format`` off the shared engine lets parallel requests
        clobber each other mid-render)."""
        node = parse(query)
        pfmt, node = self._strip_format(node)
        fmt = pfmt or fmt or "json"  # an explicit /:fmt pipe wins
        self.last_format = fmt  # kept for backward compatibility
        df = Compiler(self).compile_query(node)
        if self.autolimit:
            df = df.limit(self.autolimit)
        from . import formats

        return formats.emit(fmt, df), fmt

    def describe(self, query: str, mode: str = "formatted") -> str:
        """Explain a query's physical plan without executing it
        (reference: src/htsql/core/cmd/act.py::analyze — the /analyze
        command returned the generated SQL; here the artifact of
        interest is the Spark plan)."""
        df = self.df(query)
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )

    def store(
        self,
        query: str,
        path: str,
        format: str = "parquet",
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """Write sink: execute a query and persist the result
        (reference has no sinks — HTTP responses only; this is the
        Spark-native completion of §3.4).  Nested record/list columns
        are parquet/json-native; for csv they are flattened to JSON
        text first.  The interactive ``autolimit`` guard does NOT
        apply — a write sink must persist the full result, never a
        silently truncated one."""
        node = parse(query)
        _, node = self._strip_format(node)
        df = Compiler(self).compile_query(node)
        if format in ("csv", "tsv"):
            from .formats import _flatten_for_csv

            df = _flatten_for_csv(df)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format(format).save(path)

    # -- streaming execution mode ---------------------------------------
    def df_stream(self, query: str) -> DataFrame:
        """Compile query text → STREAMING DataFrame: every
        stream-mounted table (catalog ``stream: true``) scans via
        readStream, so the same language query that the batch engine
        answers over history executes as a Structured Stream over the
        landing directory — the execution-mode bridge on top of the
        oracle-proven batch twins (the reshape flow methods lower to
        the very kernels the streaming module runs, watermark
        included).  No autolimit (LIMIT is not streaming-legal) and
        no format pipe (formats render the drained batch result —
        run_stream/emit the result instead)."""
        node = parse(query)
        fmt, node = self._strip_format(node)
        if fmt is not None:
            raise CompileError(
                f"format pipe /:{fmt} does not apply to a streaming"
                " execution — drain with run_stream()/store_stream()"
                " and format the batch result"
            )
        if self.ordered:
            # ordered mode injects a global orderBy at finalize, which
            # streaming rejects in append mode — and a drained parquet
            # sink cannot carry a row order anyway.  (An EXPLICIT
            # .sort() after an aggregate stays legal: complete mode
            # supports post-aggregation sorting.)
            raise CompileError(
                "ordered mode does not apply to streaming execution —"
                " drain first (run_stream) and sort the batch result"
            )
        self._stream_mode.on = True
        try:
            df = Compiler(self).compile_query(node)
        finally:
            self._stream_mode.on = False
        if not df.isStreaming:
            raise CompileError(
                "query touches no stream-mounted table — declare"
                " `stream: true` on a table in catalog.yaml, or use"
                " df() for batch execution"
            )
        return df

    def start_stream(
        self,
        query: str,
        path: str,
        checkpoint: str | None = None,
        output_mode: str | None = None,
        trigger: dict | None = None,
        keys: list[str] | None = None,
        buckets: int | None = None,
    ):
        """Start a language query as a LIVE Structured Stream writing
        parquet at ``path`` and return the running ``StreamingQuery``
        (non-blocking — the serve path; ``store_stream`` is the
        blocking availableNow drain built on this).

        ``output_mode`` defaults by plan shape: aggregating queries
        run ``complete``, stateful ``anomalies()`` and non-aggregating
        queries run ``append``; passing ``keys=[...]`` (the grouping
        attribute names) selects ``update`` — the scale shape for a
        LIVE keyed aggregate, where each micro-batch MERGEs only the
        CHANGED groups into the snapshot instead of rewriting the
        world.  All three sinks are distributed foreachBatch writers
        hardened for live serving (round-11 verdict #1):

        * ``complete`` stages each epoch and swaps it in atomically
          (two checked renames, ``operators.layout.replace_dataset``)
          — a reader never observes a half-written epoch (it sees the
          previous epoch, the new one, or a momentary retryable miss
          during the rename pair), and a crash mid-write keeps the
          previous epoch.
        * ``append`` is idempotent PER BATCH: each epoch's rows land
          as ``epoch-<id>-*`` files moved in from a staged write, and
          a retry of the same epoch (foreachBatch is at-least-once —
          a crash between the write and the checkpoint commit
          redelivers it) first removes that epoch's files, so
          restarts never duplicate rows.
        * ``update`` MERGEs by ``keys`` via the CDC upsert loop
          (``streaming.snapshot.apply_cdc_batch``: broadcast key-set
          anti join — the snapshot side is never shuffled — plus the
          same checked-rename swap discipline and dataset lock), so
          at drain end the snapshot equals the complete-mode answer
          while each epoch pays O(changed groups) in BOTH compute and
          I/O: the snapshot is hash-bucketed on ``keys`` into
          ``buckets`` hive directories (default 32; size so one
          bucket is a few hundred MB at the target scale) and an
          epoch rewrites only the buckets containing touched keys —
          untouched buckets' files are not read, not listed, and not
          rewritten.  Pass ``buckets=0`` for the legacy flat layout
          (full rewrite per epoch).  The on-disk dataset carries an
          ``htsql__bucket`` partition column (reserved name); read it
          back via ``streaming.snapshot.read_snapshot`` (run_stream
          does).  ``keys`` must be the FULL set of grouping
          attributes (under-identifying keys are rejected at the
          first epoch that emits duplicate key rows) and must be
          STABLE group identities — merging session windows rename
          their group across epochs and are not update-servable;
          drain those complete.

        The checkpoint (default ``<path>.checkpoint``) gives
        exactly-once file accounting across restarts and re-drains.
        ``trigger`` is passed to ``writeStream.trigger`` verbatim
        (default ``{"availableNow": True}``; pass
        ``{"processingTime": "10 seconds"}`` for a live cadence)."""
        sdf = self.df_stream(query)
        if output_mode is None:
            output_mode = (
                "update" if keys else self._stream_output_mode(sdf)
            )
        if output_mode == "update":
            if not keys:
                raise CompileError(
                    "update mode needs keys=[...] naming the grouping"
                    " attributes — the sink MERGEs each micro-batch's"
                    " changed groups into the snapshot by key"
                )
            missing = [k for k in keys if k not in sdf.columns]
            if missing:
                raise CompileError(
                    f"update-mode keys {missing} are not attributes of"
                    f" the query result (has: {sdf.columns})"
                )
            from .streaming.snapshot import BUCKET_COL

            clash = [
                c
                for c in ("__cdc_ts", "__cdc_op", BUCKET_COL)
                if c in sdf.columns
            ]
            if clash:
                raise CompileError(
                    f"update-mode sink reserves column names {clash}"
                )
        elif output_mode not in ("complete", "append"):
            raise CompileError(
                f"output_mode {output_mode!r} is not supported by the"
                " parquet drain sink — use 'complete' (aggregates),"
                " 'append' (row streams), or 'update' with keys=[...]"
                " (live keyed aggregates)"
            )
        elif keys:
            # keys with an explicit non-update mode would be silently
            # ignored — the caller asked to MERGE, so refuse loudly
            # (round-12 review)
            raise CompileError(
                f"keys={keys!r} only applies to update mode — drop"
                f" keys for output_mode {output_mode!r}, or drop the"
                " explicit output_mode to get the keyed MERGE sink"
            )
        if buckets is not None and output_mode != "update":
            # silently ignoring a layout request would be the same
            # trap as ignored keys — refuse loudly
            raise CompileError(
                f"buckets={buckets!r} only applies to the update-mode"
                f" keyed MERGE sink, not output_mode {output_mode!r}"
            )
        cp = checkpoint or path.rstrip("/") + ".checkpoint"

        if output_mode == "complete":
            staging = path.rstrip("/") + "__epoch"

            def _sink(bdf: DataFrame, epoch_id: int) -> None:
                from .operators.layout import (
                    acquire_dataset_lock,
                    release_dataset_lock,
                    replace_dataset,
                )

                # writer exclusion like every other writer of this
                # path (round-12 review): a concurrent compaction's
                # rename pair interleaving with this epoch's swap
                # could lose the epoch or mix datasets
                sess = bdf.sparkSession
                acquire_dataset_lock(
                    sess, path, owner=f"stream_complete_epoch({path})"
                )
                try:
                    bdf.write.mode("overwrite").parquet(staging)
                    replace_dataset(sess, staging, path)
                finally:
                    release_dataset_lock(sess, path)

        elif output_mode == "update":
            n_buckets = 32 if buckets is None else int(buckets)

            def _sink(bdf: DataFrame, epoch_id: int) -> None:
                from .streaming.snapshot import apply_cdc_batch

                batch = bdf.withColumn(
                    "__cdc_op", F.lit("U")
                ).withColumn("__cdc_ts", F.lit(int(epoch_id))).localCheckpoint(
                    eager=True
                )
                # keys must uniquely identify the aggregate's groups:
                # update mode emits ONE row per changed group per
                # epoch, so duplicate keys within a batch mean the
                # keys under-identify the grouping and the MERGE
                # would keep one arbitrary row per key — fail loudly
                # instead of converging to a silently wrong snapshot
                # (round-12 review).  The batch is localCheckpointed
                # above so this extra pass doesn't recompute the
                # micro-batch.
                # the aggregate is aliased to a reserved name: a
                # grouping key literally named 'count' would make a
                # bare F.col("count") ambiguous and fail the epoch
                # with an unrelated AnalysisException (round-12
                # advice)
                dup = (
                    batch.groupBy(*keys)
                    .agg(F.count(F.lit(1)).alias("__dup_n"))
                    .filter(F.col("__dup_n") > 1)
                )
                if dup.limit(1).count():
                    raise ValueError(
                        f"update-mode keys {list(keys)} do not uniquely"
                        " identify the query's groups (an epoch emitted"
                        " multiple rows per key) — pass the FULL set of"
                        " grouping attributes"
                    )
                apply_cdc_batch(
                    bdf.sparkSession, batch, path, key=list(keys),
                    ts_col="__cdc_ts", op_col="__cdc_op",
                    buckets=n_buckets or None,
                )

        else:  # append

            def _sink(bdf: DataFrame, epoch_id: int) -> None:
                _append_epoch(bdf, path, int(epoch_id))

        # scale-adaptive shuffle/state partitioning: derive the
        # stream's partition count from the mounted data size instead
        # of inheriting the session constant (guide §2.2 — the state
        # store commits one delta file per partition per operator per
        # micro-batch, so a small landing dir under the session
        # default pays hundreds of commits per batch for nothing,
        # while a large one is sized by bytes and capped by the
        # cluster's parallelism budget).  StreamExecution clones the
        # session at start, and Spark pins the value into the
        # checkpoint's offset-log metadata, so restarts of an
        # existing checkpoint keep their original count.
        from .streaming.events import (
            _has_python_stateful,
            _stream_conf,
            derive_stream_partitions,
            stream_source_paths,
        )

        # size by the STREAM'S OWN file sources (from the analyzed
        # plan), not the whole mounted data_dir — a small stream
        # co-mounted with a large batch warehouse must not inherit
        # the warehouse's partition count (r13 advice).  data_dir is
        # the fallback when no file source is identifiable.
        srcs = stream_source_paths(sdf) or [self.data_dir]
        parts = derive_stream_partitions(
            self.spark,
            *srcs,
            compute_floor=_has_python_stateful(sdf),
        )
        with _stream_conf(self.spark, parts):
            return (
                sdf.writeStream.outputMode(output_mode)
                .foreachBatch(_sink)
                .option("checkpointLocation", cp)
                .trigger(**(trigger or {"availableNow": True}))
                .start()
            )

    @staticmethod
    def _stream_output_mode(sdf: DataFrame) -> str:
        """Default output mode by ANALYZED-PLAN SHAPE (no execution):
        walk the logical tree's node names — a substring scan over the
        plan string would false-positive on user aliases like
        ``:as myAggregate`` (round-11 review).  Stateful kernels
        (applyInPandasWithState) declare their own append contract;
        aggregates drain complete (the final rewrite IS the batch
        answer); everything else appends."""
        node = sdf._jdf.queryExecution().analyzed()
        # full walk, carrying "an Aggregate sits ABOVE me" down each
        # root-to-leaf path (round-11 review: returning 'append' at the
        # FIRST stateful node mis-modes an aggregate composed OVER
        # anomalies() — Spark then rejects the start with a generic
        # watermark error; the composition is never streaming-legal,
        # so name it here instead)
        stack, has_agg, stateful = [(node, False)], False, False
        while stack:
            n, agg_above = stack.pop()
            name = n.nodeName()
            if name == "FlatMapGroupsInPandasWithState":
                if agg_above:
                    raise CompileError(
                        "an aggregate over a stateful anomalies() stream"
                        " is not streaming-legal (the state kernel's"
                        " append rows cannot feed a streaming aggregate"
                        " without a watermark) — drain the anomalies"
                        " stream first (run_stream) and aggregate the"
                        " batch result"
                    )
                stateful = True
            if name == "Aggregate":
                has_agg = True
                agg_above = True
            for i in range(n.children().size()):
                stack.append((n.children().apply(i), agg_above))
        if stateful and has_agg:
            # the ancestor walk above catches aggregate-OVER-stateful;
            # this catches the two in SEPARATE branches (a join of an
            # aggregate with anomalies()) — the aggregate branch needs
            # complete/update while the state kernel declares append,
            # so no single output mode is streaming-legal and Spark
            # would surface a generic error at start (round-12 advice)
            raise CompileError(
                "a plan combining a streaming aggregate with a stateful"
                " anomalies() kernel (in any branches) has no legal"
                " output mode — drain the anomalies stream first"
                " (run_stream) and compose the batch results"
            )
        if stateful:
            return "append"
        return "complete" if has_agg else "append"

    def store_stream(
        self,
        query: str,
        path: str,
        checkpoint: str | None = None,
        output_mode: str | None = None,
        keys: list[str] | None = None,
        buckets: int | None = None,
    ) -> None:
        """Streaming write sink: execute a language query AS A STREAM
        (readStream scans + availableNow trigger + checkpoint) and
        persist the drained result as parquet at ``path`` — the
        blocking drain over :meth:`start_stream`.  Re-runs over an
        unchanged landing dir are no-ops (exactly-once file
        accounting via the checkpoint)."""
        q = self.start_stream(
            query, path, checkpoint=checkpoint, output_mode=output_mode,
            keys=keys, buckets=buckets,
        )
        q.awaitTermination()

    def run_stream(
        self,
        query: str,
        output_mode: str | None = None,
        keys: list[str] | None = None,
        buckets: int | None = None,
    ) -> DataFrame:
        """Execute a language query as a stream (store_stream into a
        scratch sink) and return the drained result as a BATCH
        DataFrame — the serve path the parity tests and the driver
        rows use.  The result is localCheckpoint-materialized so the
        scratch sink can be reclaimed immediately."""
        import os
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="htsql_stream_")
        try:
            out = os.path.join(base, "out")
            self.store_stream(
                query,
                out,
                checkpoint=os.path.join(base, "checkpoint"),
                output_mode=output_mode,
                keys=keys,
                buckets=buckets,
            )
            # read_snapshot strips the update sink's htsql__bucket
            # partition column; a no-op for the other sinks' layouts
            from .streaming.snapshot import read_snapshot

            return read_snapshot(self.spark, out).localCheckpoint(eager=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def produce_stream(self, query: str) -> list[dict]:
        """run_stream + rows-as-dicts (the produce() twin)."""
        return [
            row.asDict(recursive=True)
            for row in self.run_stream(query).collect()
        ]


def _append_epoch(bdf: DataFrame, path: str, epoch_id: int) -> None:
    """Idempotent per-batch append for the streaming parquet sink:
    stage the epoch's rows with ``mode('overwrite')`` (a retry simply
    re-stages), remove any ``epoch-<id>-*`` files a crashed prior
    attempt of THIS epoch left in the sink, then move the staged part
    files in under epoch-tagged names.  foreachBatch is at-least-once
    — a crash between the parquet write and the checkpoint commit
    redelivers the same epoch_id with the same rows (round-11 review:
    a plain ``mode('append')`` write duplicated them) — so the delete
    + tagged-rename makes the retry converge to exactly one copy.
    Epochs are serialized by the streaming engine, so the staging
    subdirectory is never contended; readers of ``path`` may see a
    prefix of an in-flight epoch's files (append semantics: every
    row visible is final), never a duplicate."""
    spark = bdf.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    dst = HPath(path)
    fs = dst.getFileSystem(conf)
    staging = f"{path.rstrip('/')}__epochs/{epoch_id}"
    bdf.write.mode("overwrite").parquet(staging)
    fs.mkdirs(dst)
    tag = f"epoch-{epoch_id:020d}-"
    # stale-file cleanup is scoped to THIS epoch's tag via a
    # server-side glob — a full listStatus of the sink would cost
    # O(total files) per micro-batch, turning a long-running append
    # stream quadratic in its own history
    stale = fs.globStatus(HPath(str(dst) + "/" + tag + "*"))
    for s in stale or []:
        if not s.isDirectory():
            fs.delete(s.getPath(), False)
    for s in fs.listStatus(HPath(staging)):
        name = s.getPath().getName()
        if s.isDirectory() or not name.startswith("part-"):
            continue
        target = HPath(str(dst) + "/" + tag + name)
        if not fs.rename(s.getPath(), target):
            raise IOError(
                f"_append_epoch: rename into {path} failed for {name}"
                f" (epoch {epoch_id})"
            )
    fs.delete(HPath(staging), True)


def get_spark(app_name: str = "htsql-spark", cpus: int | None = None) -> SparkSession:
    """Local session tuned per the 100 TB posture (AQE on, sane
    shuffle partitioning); on a real cluster only master/memory
    change."""
    import os

    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # deployment-specific overrides without code edits (e.g. cluster
    # memory/codec tuning, A/B of planner flags):
    # SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            b = b.config(k.strip(), v.strip())
    return b.getOrCreate()
