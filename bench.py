#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop sink (full plan execution, no driver
collect overhead beyond what the query itself does).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entry_mod
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/Arrow warmup on synthetic rows only — no benchmark data is
    # touched, so per-query timings measure queries, not JIT.
    spark.range(20_000_000).selectExpr("sum(id * 2)").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, schema="x int"
    ).write.format("noop").mode("overwrite").save()

    # Two executions per query, report the min: the first run of each DISTINCT
    # plan pays ~1.5 s of one-time codegen compile + Python-worker spinup
    # (measured in PERF.md), a fixed cost that is noise at bench scale and
    # nonexistent at real scale. min-of-2 is the steady-state number.
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        runs = []
        try:
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
        except Exception as e:  # a failing query gets a null, not a crash
            print(f"bench error {name}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            timings[name] = None
            continue
        dt = min(runs)
        timings[name] = dt
        all_runs[name] = runs
        total += dt

    print(json.dumps({
        "metric": "total_query_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # both raw run times per query: distinguishes one-time plan-compile /
        # machine-noise spikes (run1 >> run2) from real regressions (both high)
        "runs": all_runs,
        "sf": sf,
        "mode": "min_of_2_runs",
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
