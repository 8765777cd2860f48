#!/usr/bin/env python
"""Round-14 item #8 (r13 verdict): decompose stream_cdc's drain cost.

Runs the exact _stream_cdc entry shape but with wall-clock probes
around each phase: fixture derivation (b1/b2 writes), the
availableNow drain (and inside it, per-epoch apply_cdc_batch time via
a monkeypatch), and the final snapshot read.  Timing methodology is
bench.py's (fresh session, warm scan first); this tool never writes
BENCH.json — it exists to attribute the 4.3 s driver recording to
rewrite fan-out vs state commits vs fixture prep.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import CPUS, SF_DIR  # noqa: E402


def main() -> None:
    import __spark_entry__ as entry_mod
    from htsql_spark import get_spark
    from htsql_spark.streaming import snapshot as snap_mod

    spark = get_spark("htsql-spark-cdcprof", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # warm (codegen, filesystem caches) — bench.py does the same
    qs["scan"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    qs["stream_cdc"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    phases: dict[str, float] = {}
    epochs: list[float] = []

    orig_apply = snap_mod.apply_cdc_batch

    def timed_apply(*a, **kw):
        t0 = time.perf_counter()
        out = orig_apply(*a, **kw)
        epochs.append(round(time.perf_counter() - t0, 3))
        return out

    orig_run = snap_mod.run_cdc_snapshot

    def timed_run(*a, **kw):
        t0 = time.perf_counter()
        out = orig_run(*a, **kw)
        phases["drain_total"] = round(time.perf_counter() - t0, 3)
        return out

    snap_mod.apply_cdc_batch = timed_apply
    snap_mod.run_cdc_snapshot = timed_run
    # the entry imports `streaming` (package re-export) — patch there too
    import htsql_spark.streaming as streaming_pkg

    streaming_pkg.run_cdc_snapshot = timed_run

    try:
        for rep in range(3):
            epochs.clear()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs["stream_cdc"](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                json.dumps(
                    {
                        "rep": rep,
                        "total": round(t2 - t0, 3),
                        "build_incl_fixture_and_drain": round(t1 - t0, 3),
                        "final_read_noop": round(t2 - t1, 3),
                        "drain_total": phases.get("drain_total"),
                        "apply_cdc_batch_epochs": list(epochs),
                        "fixture_prep_approx": round(
                            (t1 - t0) - phases.get("drain_total", 0.0), 3
                        ),
                    }
                ),
                flush=True,
            )
    finally:
        snap_mod.apply_cdc_batch = orig_apply
        snap_mod.run_cdc_snapshot = orig_run
        streaming_pkg.run_cdc_snapshot = orig_run


if __name__ == "__main__":
    main()
