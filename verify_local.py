#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs entry(spark) as a smoke check, then every queries()[name] at sf0.01 and
compares row-count + column names + order-insensitive values against
oracle_sql()[name] via DuckDB. Exact value equality (after per-cell normalize)
— the same bar the driver's value-hash implies.

Uses a BARE SparkSession by default (no get_spark() engine confs) so any
dependency on builder-only session state — the exact divergence that broke
round 1 — shows up here before it shows up in the driver's run. Pass --tuned
to use get_spark() instead. Also fails any query whose output has array/map
columns: the driver's canonicalizer cannot hash those.

Usage: python verify_local.py [--tuned] [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr, not the float: the driver's hash is byte-level, so it
        # distinguishes -0.0 from 0.0 where Python == cannot — exactly the
        # divergence that kept q89 red through r5/r6 while this script
        # passed. String equality of repr(round(x, 9)) adds ONLY the
        # sign-of-zero sensitivity on top of the old rounded-== compare.
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: gives a total order even with NULLs / mixed types
    return sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--tuned"]
    tuned = "--tuned" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if tuned:
        from jsonify2ai_spark.session import get_spark

        spark = get_spark("verify_local")
    else:
        # Bare session, like the driver's harness: no engine confs. Queries and
        # load_tables must set every runtime conf they depend on themselves.
        import os

        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.appName("verify_local_bare")
            .master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    print("== entry() smoke ==")
    t0 = time.time()
    edf = entry_mod.entry(spark)
    erows = edf.collect()
    print(f"entry: {len(erows)} rows in {time.time()-t0:.1f}s, schema={edf.columns}")
    assert len(erows) >= 0

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                failures.append(name)
                print(
                    f"FAIL {name}: array/map/struct output cols {complex_cols} "
                    "(driver canonicalizer cannot hash these — emit strings)"
                )
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"okNA {name}: {len(srows)} rows (no oracle, rows-only) {spark_t:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        ns, no = norm_rows(scols, srows), norm_rows(ocols, orows)
        if ns != no:
            failures.append(name)
            bad = [(a, b) for a, b in zip(ns, no) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            continue
        print(f"ok   {name}: {len(srows)} rows match ({spark_t:.1f}s)")

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
