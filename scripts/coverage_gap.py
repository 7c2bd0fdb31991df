"""Print the driver-correctness blind spot: registered queries that have
never held a row in any CORRECTNESS_r*.json.

The grading driver checks only the first 50 entries of
``__spark_entry__.queries()`` per round, so a query can stay green in
the in-repo oracle gate for rounds while never earning the *hard*
driver-artifact signal. The r5 verdict counted 44 such queries; this
helper makes the remaining number a printed fact each round so the
window rotation (registry._PRIORITY) can keep burning it down.

Usage: python scripts/coverage_gap.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_iceberg_with_clickhouse_olake_spark.operators.registry import (
    _PRIORITY,
    all_queries,
)


def checked_ever() -> dict[str, list[str]]:
    """name -> rounds in which the driver recorded a correctness row."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).removesuffix(".json").removeprefix(
            "CORRECTNESS_"
        )
        try:
            with open(path) as f:
                rows = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        for name in rows:
            out.setdefault(name, []).append(rnd)
    return out


def main() -> int:
    names = list(all_queries())
    seen = checked_ever()
    never = [n for n in names if n not in seen]
    next_window = [n for n in _PRIORITY if n not in seen]

    report = {
        "registered": len(names),
        "ever_driver_checked": len([n for n in names if n in seen]),
        "never_driver_checked": len(never),
        "never_names": never,
        "in_current_window_first_time": next_window,
    }
    if "--json" in sys.argv:
        print(json.dumps(report, indent=1))
        return 0
    print(
        f"registered={report['registered']} "
        f"ever-checked={report['ever_driver_checked']} "
        f"NEVER-checked={report['never_driver_checked']}"
    )
    if next_window:
        print(
            "window entries earning their first driver row next round: "
            + ", ".join(next_window)
        )
    if never:
        print("never driver-checked:")
        for n in never:
            print(f"  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
