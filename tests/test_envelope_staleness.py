"""Envelope-staleness gate (r16 VERDICT item 3), as code instead of
prose.

The same-code envelope (BENCH_ENVELOPE.json) is only evidence about
the code revision it was measured at. Two rounds in a row an operator
commit landed AFTER the close-out envelope (r15: the 0493d3b refactor;
r16: the curriculum pair 3bbeaf7) and the claim was patched up with an
honest BENCH_NOTES amendment — convention, not enforcement. This test
is the enforcement: it FAILS when any module that defines a benched
suite query (bench.HEADLINE + bench.LLM_SUITE) has commits — or
uncommitted working-tree edits — after ``BENCH_ENVELOPE.code_rev``.

The guarded set is every package ``.py`` file that EXISTED at
``code_rev`` — not just the modules that define benched queries: this
round's own NULL-text fix (functions/__init__.py) changed benched
ops' code paths from a module no benched query is defined in, so the
narrow formulation has a hole the wide one closes.

Explicitly allowed (the r16 amendment pattern): new modules added
after the envelope (they cannot have been on any benched path at
envelope time — if benched code MOVES into a new file, the old file
shows a diff and the test still fires), registry plumbing
(operators/registry.py holds no query bodies — a new op's
registration line lands there), docs, artifacts, tests, and bench.py
gate metadata (WIDE_BAND entries — paths the timed queries never
execute).

Mid-round escape: set SPARK_GRAFT_MIDROUND=1 to skip while actively
authoring operators between envelopes. Close-out and judge runs must
NOT set it — the whole point is that the final pytest at final code
binds.
"""

from __future__ import annotations

import inspect
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from apache_iceberg_with_clickhouse_olake_spark.operators import registry  # noqa: E402


def _benched_module_files() -> set[str]:
    """Repo-relative paths of every module defining a benched query.

    ``semantic_dedup_twolevel_spread`` is bench-internal (it re-times
    ``semantic_dedup_twolevel_stats`` on a setup-built corpus), so its
    code is covered via the stats query's module.
    """
    queries = registry.all_queries()
    files: set[str] = set()
    for name in tuple(bench.HEADLINE) + tuple(bench.LLM_SUITE):
        fn = queries[name]
        src = inspect.getsourcefile(inspect.unwrap(fn))
        assert src is not None, name
        rel = os.path.relpath(src, REPO)
        # A query resolving to the cache-scope wrapper means unwrap
        # failed and the gate would silently guard the wrong file.
        assert not rel.endswith("_cache.py"), f"{name} resolved to the wrapper"
        files.add(rel)
    return files


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def test_envelope_not_stale_for_benched_modules():
    if os.environ.get("SPARK_GRAFT_MIDROUND") == "1":
        pytest.skip("mid-round authoring window (SPARK_GRAFT_MIDROUND=1)")
    env_path = os.path.join(REPO, "BENCH_ENVELOPE.json")
    if not os.path.exists(env_path):
        pytest.skip("no BENCH_ENVELOPE.json yet")
    with open(env_path) as f:
        code_rev = json.load(f)["code_rev"]

    # The envelope rev must exist and be an ancestor of HEAD; a rebased
    # or garbage rev makes the claim unverifiable, which is a failure.
    probe = subprocess.run(
        ["git", "merge-base", "--is-ancestor", code_rev, "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    )
    assert probe.returncode == 0, (
        f"BENCH_ENVELOPE.code_rev {code_rev!r} is not an ancestor of HEAD; "
        "the envelope claim is unverifiable"
    )

    # Sanity: every benched query must resolve to a real module inside
    # the package (unwrap working), and those modules must be a subset
    # of the guarded set below.
    benched = _benched_module_files()
    pkg = "apache_iceberg_with_clickhouse_olake_spark"
    guarded = {
        f
        for f in _git("ls-tree", "-r", "--name-only", code_rev, pkg).split()
        if f.endswith(".py") and f != f"{pkg}/operators/registry.py"
    }
    assert benched - {f"{pkg}/operators/registry.py"} <= guarded, (
        f"benched modules outside the guarded set: {benched - guarded}"
    )
    files = sorted(guarded)
    committed = _git(
        "log", "--name-only", "--format=", f"{code_rev}..HEAD", "--", *files
    ).split()
    dirty = [
        line[3:]
        for line in _git("status", "--porcelain", "--", *files).splitlines()
    ]
    offenders = sorted((set(committed) | set(dirty)) & guarded)
    assert not offenders, (
        f"benched modules changed after BENCH_ENVELOPE.code_rev {code_rev}: "
        f"{offenders} — re-run the close-out envelope at the last "
        "operator-source-touching commit before shipping"
    )
