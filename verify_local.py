#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs entry(spark) as a smoke check, then every queries()[name] at sf0.01 and
compares row-count + column names + order-insensitive values against
oracle_sql()[name] via DuckDB. Exact value equality (after per-cell normalize)
— the same bar the driver's value-hash implies.

Usage: python verify_local.py [sf_dir] [query_name ...]
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
        return round(v, 9)
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from jsonify2ai_spark.session import get_spark

    spark = get_spark("verify_local")
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
