#!/usr/bin/env python
"""Gate-rotation bookkeeping: per query, rounds since its last driver-green
CORRECTNESS row, vs its position in the current gate (first 50 entries of
queries()). Run from the repo root before finalizing a round's rotation:

    python scripts/gate_staleness.py

Flags (stale >= 2 and out-of-gate) are the queries that MUST rotate into
the gate next round to honor the "no query goes >2 rounds without a
driver row" invariant the verdicts audit.

    python scripts/gate_staleness.py --check

exits non-zero when the committed first-50 ordering WASTES a gate slot:
some out-of-gate oracle-backed query is strictly staler (smaller
last-driver-green round; never-green counts as stalest) than some in-gate
query. When the total stale debt exceeds 50 slots no ordering can clear
it in one round, so --check enforces the strongest satisfiable form of
the policy: the gate must be a 50-stalest set (ties broken freely).
Policy (b) — "changed-this-round code gates even if fresh" — is honored
via `GATE_FRESH_EXEMPT` in __spark_entry__ (a list of query names this
round's edits touched; exempt names are skipped by the comparison).
tests/test_entry.py runs --check as a pytest row, so a round can no
longer skip its rotation silently (the r10 miss, mechanized — r10
verdict #2).

INTENTIONAL red window (r11 advisor item, adjudicated by the r11
judge as working-as-designed): --check reads live CORRECTNESS_r*.json
globs, so the moment the driver lands a round's artifact the committed
gate ordering becomes "last round's" and the check goes red until the
new round's rotation commits. That red IS the forcing function — it
makes the rotation un-skippable as the next round's first task. Do not
"fix" it by skipping artifacts newer than the committed gate's round;
that would re-open the silent-skip hole the tool exists to close.
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
    if "--check" in sys.argv[1:]:
        # Gate-waste check: no out-of-gate oracle-backed query may be
        # strictly staler than an in-gate one (never-green -> round 0,
        # i.e. stalest: new queries MUST take their first driver row).
        exempt = set(getattr(entry_mod, "GATE_FRESH_EXEMPT", ()))
        in_gate = [(greens.get(n, 0), n) for n in qs[:50] if n in oracled and n not in exempt]
        out_gate = [(greens.get(n, 0), n) for n in qs[50:] if n in oracled and n not in exempt]
        if not in_gate or not out_gate:
            print("check: nothing to compare")
            return 0
        freshest_in = max(in_gate)
        stalest_out = min(out_gate)
        if stalest_out[0] < freshest_in[0]:
            print(
                "CHECK FAILED: gate slot wasted — out-of-gate "
                f"{stalest_out[1]} (last green r{stalest_out[0]}) is staler "
                f"than in-gate {freshest_in[1]} (last green r{freshest_in[0]}). "
                "Rotate the stalest 50 oracle-backed queries into the gate "
                "(list them with: python scripts/gate_staleness.py), or add "
                "changed-this-round names to GATE_FRESH_EXEMPT."
            )
            return 1
        print(f"check OK: gate is a 50-stalest set (freshest in-gate last green r{freshest_in[0]})")
        return 0
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
