#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
  tag     e.g. r15  -> writes plans/r15/<query>_<suffix>.txt
  suffix  e.g. before / after
  query   query-function names (q136_ivf_store ...); default: all

Runs each queries()[name] builder (store-building queries execute their
build side effects) and writes the returned frame's formatted plan.
SPARK_GRAFT_SCRATCH_MEMO is honored so store builds are shared across
captured queries exactly as in bench.py — the capture is about plan
shape, not timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SCRATCH_MEMO", "1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join(repo, "plans", tag)
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    if not names:
        names = list(queries)
    rc = 0
    for name in names:
        if name not in queries:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            rc = 1
            continue
        spark.sparkContext.setJobDescription(f"capture_plans {name}")
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
