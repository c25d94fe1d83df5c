#!/usr/bin/env python
"""Gate-rotation bookkeeping: per query, rounds since its last driver-green
CORRECTNESS row, vs its position in the current gate (first 50 entries of
queries()). Run from the repo root before finalizing a round's rotation:

    python scripts/gate_staleness.py

Flags (stale >= 2 and out-of-gate) are the queries that MUST rotate into
the gate next round to honor the "no query goes >2 rounds without a
driver row" invariant the verdicts audit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry_mod

    qs = list(entry_mod.queries())
    gate = set(qs[:50])

    greens: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        rounds.append(rnd)
        data = json.load(open(path))
        for name, row in data.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if ok:
                greens[name] = max(greens.get(name, 0), rnd)
    if not rounds:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    this_round = max(rounds) + 1  # artifacts exist for completed rounds

    oracled = set(entry_mod.oracle_sql())
    orphans = [n for n in qs if n not in oracled]
    if orphans:
        # Since r7 every contract query must be oracle-backed (q63, the one
        # ML-fit exception, was retired — q64 carries the family). A new
        # oracle-less query is a permanent staleness hole: flag it loudly.
        print(f"WARNING: oracle-less queries (can never earn a value row): {orphans}")
    flagged = []
    for name in qs:
        if name not in oracled:
            continue
        last = greens.get(name)
        if name not in gate and (last is None or this_round - last >= 2):
            flagged.append((name, last))
    print(f"queries: {len(qs)} | in gate: 50 | artifacts: r{min(rounds)}-r{max(rounds)}")
    print(f"assuming current gate goes green in round {this_round}:")
    if not flagged:
        print("  no out-of-gate query will be >=2 rounds stale — rotation OK")
    else:
        print("  ROTATE NEXT ROUND (>=2 rounds stale after this one):")
        for name, last in sorted(flagged, key=lambda x: (x[1] or 0)):
            print(f"    {name:<34} last driver-green: {'never' if last is None else f'r{last}'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
