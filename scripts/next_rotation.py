"""Propose the next driver-window rotation for the evidence burndown.

The grading driver records correctness rows for the FIRST 50 registry
entries, so each round rotates never-driver-checked queries into
``registry._PRIORITY`` while keeping every SURVEY.md §2 op-id tag and
LLM family covered (the invariant tests/test_registry_window.py pins).
Composing that set by hand is the recurring chore of every round's
item-1; this tool computes it:

  1. ever-checked = union of names across all CORRECTNESS_r*.json
     (plus the CURRENT window, which earns its rows when the round
     closes -- run this only to prepare the NEXT round's rotation);
  2. candidates  = registered names never in that union;
  3. window      = all candidates (if <= 50), then greedily top up
     with already-checked names until every op-id/family tag that
     appears anywhere in the registry is covered and the window holds
     exactly 50 names.

Prints the proposed ``_PRIORITY`` tuple body and the invariant check
result. It does NOT edit registry.py -- the rotation lands as the next
round's first commit, after the driver has recorded the current
window's rows.

Names passed as arguments are FORCE-SEEDED into the window before the
greedy cover runs (r12 lesson: names whose only driver rows are old
FAILs count as "ever-checked", so the never-checked fill skips them
forever -- seeding is the only way to re-sample them):

  python scripts/next_rotation.py unique_customers_approx ...
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
_OP_ID = re.compile(r"^[SPJAOUFDCLG]\d+$")
_FAMILIES = {
    "llm-dedup", "llm-similarity", "llm-text", "llm-sessions",
    "llm-sampling", "multimodal", "W-ext",
}


def main() -> int:
    from apache_iceberg_with_clickhouse_olake_spark.operators import registry

    registry._load_all()
    reg = registry.REGISTRY
    ever: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            ever.update(json.load(f))
    ever.update(registry._PRIORITY)  # current window lands at round close

    never = [n for n in reg if n not in ever]

    def tags(names):
        out: set[str] = set()
        for n in names:
            out.update(reg[n].tags)
        return out

    want = {t for t in tags(reg) if _OP_ID.match(t) or t in _FAMILIES}
    # Greedy set cover over ALL names, tie-breaking toward never-
    # checked ones (a never-checked coverer advances both goals), then
    # spend the leftover slots on the remaining never-checked, then on
    # current-window representatives.
    forced = sys.argv[1:]
    unknown = [n for n in forced if n not in reg]
    if unknown:
        print(f"unknown forced names: {unknown}")
        return 2
    window: list[str] = list(forced)
    while len(window) < WINDOW:
        need = want - tags(window)
        if not need:
            break
        best = max(
            (n for n in reg if n not in window),
            key=lambda n: (len(tags([n]) & need), n not in ever),
            default=None,
        )
        if best is None or not (tags([best]) & need):
            break
        window.append(best)
    for pool in (never, list(registry._PRIORITY),
                 [n for n in reg if n in ever]):
        for n in pool:
            if len(window) >= WINDOW:
                break
            if n not in window:
                window.append(n)
    window = window[:WINDOW]
    missing = sorted(want - tags(window))
    print(f"proposed window: {len(window)} names, "
          f"{len([n for n in window if n not in ever])} first-driver-rows")
    print(f"invariant: {'OK' if not missing else 'MISSING ' + str(missing)}")
    print("\n_PRIORITY = (")
    for n in window:
        mark = "  # first driver row" if n not in ever else ""
        print(f'    "{n}",{mark}')
    print(")")
    return 0 if not missing else 1


if __name__ == "__main__":
    sys.exit(main())
