"""Propose the next driver-window rotation.

The grading driver records correctness rows for the FIRST 50 registry
entries, so each round rotates queries into ``registry._PRIORITY``
while keeping every SURVEY.md §2 op-id tag and LLM family covered
(the invariant tests/test_registry_window.py pins). Composing that
set by hand is the recurring chore of every round's item-1; this tool
computes it:

  1. last_checked[name] = newest CORRECTNESS_r*.json round containing
     the name (the CURRENT window counts as checking at the upcoming
     round close -- run this only to prepare the NEXT round);
  2. cover   = greedy tag set-cover over all names so every op-id /
     LLM-family tag keeps a carrier, tie-breaking toward the stalest
     carrier (a stale coverer advances both goals);
  3. fill    = remaining slots spent stalest-first (never-checked
     names are infinitely stale and go first -- the pre-blind-spot-0
     behavior falls out as the staleness=infinity special case).

STEADY-STATE POLICY (r14 VERDICT item 3): once every name has a
driver row (blind spot 0, reached at r15 close), the rotation
question becomes bounded STALENESS. Stalest-first fill guarantees
every registered name is re-checked within ceil(N / F) rounds, where
N = registry size and F = fill slots per round (window minus
cover-only slots); the proposal prints that bound. The structural
property -- no omitted name is staler than any fill-stage member --
is pinned by tests/test_rotation_staleness.py.

Prints the proposed ``_PRIORITY`` tuple body and the invariant check
result. It does NOT edit registry.py -- the rotation lands as the next
round's first commit, after the driver has recorded the current
window's rows.

Names passed as arguments are FORCE-SEEDED into the window before the
greedy cover runs (r12 lesson: names whose only driver rows are old
FAILs still count as "checked", just with an old timestamp -- but a
FAIL-retest wants a slot NOW, not when its turn comes):

  python scripts/next_rotation.py unique_customers_approx ...
"""
from __future__ import annotations

import glob
import json
import math
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


def last_checked_rounds() -> tuple[dict[str, int], int]:
    """(last_checked, cur_round): newest CORRECTNESS round per name,
    with the CURRENT ``registry._PRIORITY`` window stamped at
    cur_round (it earns its rows when the in-flight round closes)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators import registry

    registry._load_all()
    last: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        with open(path) as f:
            for n in json.load(f):
                last[n] = max(last.get(n, 0), rnd)
    cur_round = newest + 1
    for n in registry._PRIORITY:
        last[n] = max(last.get(n, 0), cur_round)
    return last, cur_round


def propose(
    forced: tuple[str, ...] = (),
    last: dict[str, int] | None = None,
    cur_round: int | None = None,
) -> tuple[list[str], dict]:
    """Compose the next window; returns (window, meta). meta carries
    the cover/fill split, last_checked map, staleness bound, and the
    missing-tags list (empty = invariant OK). ``last``/``cur_round``
    default to the repo's CORRECTNESS history; pass them explicitly to
    simulate the policy forward (tests/test_rotation_staleness.py pins
    the empirical re-check gap that way)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators import registry

    registry._load_all()
    reg = registry.REGISTRY
    if last is None or cur_round is None:
        last, cur_round = last_checked_rounds()

    def staleness(n: str) -> float:
        # never-checked names are infinitely stale
        return (
            math.inf if n not in last else float(cur_round - last[n])
        )

    def tags(names):
        out: set[str] = set()
        for n in names:
            out.update(reg[n].tags)
        return out

    want = {t for t in tags(reg) if _OP_ID.match(t) or t in _FAMILIES}
    unknown = [n for n in forced if n not in reg]
    if unknown:
        raise ValueError(f"unknown forced names: {unknown}")
    # Dedupe forced names (preserving order) and refuse an overfull
    # request outright -- silently truncating explicitly requested
    # retest slots is worse than erroring.
    forced = tuple(dict.fromkeys(forced))
    if len(forced) > WINDOW:
        raise ValueError(
            f"{len(forced)} forced names exceed the {WINDOW}-slot window"
        )
    # Fill EVERY free slot stalest-first, then REPAIR tag coverage by
    # evicting the freshest members (fill-first beats cover-first: the
    # r15-draft cover-first order consumed 35 slots on the greedy
    # cover and left F=15 fill slots -- a ceil(218/15)=15-round bound;
    # repair typically displaces far fewer names, and the displaced
    # ones are the freshest, which cost the least staleness).
    window: list[str] = list(forced)
    pool = sorted(
        (n for n in reg if n not in window),
        key=lambda n: (-staleness(n), n),
    )
    window += pool[: WINDOW - len(window)]
    while True:
        need = want - tags(window)
        if not need:
            break
        best = max(
            (n for n in reg if n not in window),
            key=lambda n: (len(tags([n]) & need), staleness(n), n),
            default=None,
        )
        if best is None or not (tags([best]) & need):
            break  # tag uncoverable; reported via `missing`
        window.append(best)
        # Evict the FRESHEST non-forced member whose removal uncovers
        # nothing (there is always one in practice: `best` itself is
        # never a candidate, and a 50-name window over ~84 tags has
        # redundant carriers; if ever none exists, shrink honestly and
        # let the missing-tags report say so).
        for ev in sorted(
            (n for n in window[:-1] if n not in forced),
            key=lambda n: (staleness(n), n),
        ):
            rest = [x for x in window if x != ev]
            if want - tags(rest) == want - tags(window):
                window = rest
                break
        if len(window) > WINDOW:
            break  # no safe eviction found; stop repairing
    window = window[:WINDOW]
    missing = sorted(want - tags(window))
    # Post-hoc cover/fill classification: a member is COVER when it is
    # the window's sole carrier of some required tag (removing it
    # would uncover the tag); everything else is FILL -- slots the
    # stalest-first policy actually controls. (Classifying by how a
    # name ENTERED the window misstates both sides: a fresh sole
    # carrier placed by the stalest-first fill is cover in every way
    # that matters, and a repair-added name can become redundant when
    # a later repair adds an overlapping carrier.)
    base_missing = set(missing)

    def _sole_carrier(n: str) -> bool:
        rest = [x for x in window if x != n]
        return (want - tags(rest)) != base_missing

    cover = [n for n in window if n not in forced and _sole_carrier(n)]
    fill = [n for n in window if n not in forced and n not in cover]
    n_reg = len(reg)
    f_slots = max(1, len(fill))
    meta = {
        "cover": cover,
        "fill": fill,
        "forced": list(forced),
        "last_checked": last,
        "cur_round": cur_round,
        "missing": missing,
        "registry_size": n_reg,
        # steady-state bound: with F fill slots per round over N names
        # taken stalest-first, no name goes unchecked longer than
        # ceil(N / F) rounds.
        "staleness_bound_rounds": math.ceil(n_reg / f_slots),
    }
    return window, meta


def main() -> int:
    forced = tuple(sys.argv[1:])
    try:
        window, meta = propose(forced)
    except ValueError as exc:
        print(exc)
        return 2
    last, cur = meta["last_checked"], meta["cur_round"]
    first = [n for n in window if n not in last]
    print(f"proposed window: {len(window)} names, "
          f"{len(first)} first-driver-rows")
    print(f"invariant: "
          f"{'OK' if not meta['missing'] else 'MISSING ' + str(meta['missing'])}")
    stalest_in = max(
        ((cur - last[n]) for n in window if n in last), default=0
    )
    omitted = [n for n in meta["last_checked"] if n not in window]
    stalest_out = max(
        ((cur - last[n]) for n in omitted if n in last), default=0
    )
    print(
        f"staleness: registry {meta['registry_size']} names, "
        f"bound ceil(N/F) = {meta['staleness_bound_rounds']} rounds; "
        f"stalest in-window {stalest_in}, stalest omitted {stalest_out}"
    )
    print("\n_PRIORITY = (")
    for n in window:
        mark = "  # first driver row" if n not in last else ""
        print(f'    "{n}",{mark}')
    print(")")
    return 0 if not meta["missing"] else 1


if __name__ == "__main__":
    sys.exit(main())
