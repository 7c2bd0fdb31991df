"""Property tests (hypothesis) for the pure helpers the engine's
correctness contracts lean on — no SparkSession needed, so these run in
milliseconds and fuzz the edges the example-based tests fix in place."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_iceberg_with_clickhouse_olake_spark.sources.lake import (
    _catalog_from_confs,
    _pick_snapshot_id,
    _rewrite_target_size,
    _table_name_for_path,
)


@given(st.lists(st.integers(), min_size=1, max_size=50))
def test_pick_snapshot_latest_is_last(ids):
    assert _pick_snapshot_id(ids, None) == ids[-1]


@given(st.lists(st.integers(), min_size=1, max_size=50), st.data())
def test_pick_snapshot_version_is_positional(ids, data):
    v = data.draw(st.integers(min_value=1, max_value=len(ids)))
    assert _pick_snapshot_id(ids, v) == ids[v - 1]


@given(
    st.lists(st.integers(), min_size=1, max_size=50),
    st.integers(),
)
def test_pick_snapshot_out_of_range_raises(ids, v):
    import pytest

    if 1 <= v <= len(ids):
        return
    with pytest.raises(FileNotFoundError):
        _pick_snapshot_id(ids, v)


@given(
    st.integers(min_value=0, max_value=1 << 50),
    st.integers(min_value=0, max_value=10_000),
)
def test_rewrite_target_size_bounds(total_bytes, target_files):
    size = _rewrite_target_size(total_bytes, target_files)
    # never degenerate, and sized so ~target_files outputs result
    assert size >= 1024 * 1024
    assert size >= total_bytes // max(target_files, 1) + 1 or size == 1024 * 1024


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=80))
def test_table_name_is_valid_sql_identifier(path):
    import re

    name = _table_name_for_path("/tmp/x/" + path)
    assert re.fullmatch(r"\w*_[0-9a-f]{8}", name), name


@given(st.text(max_size=60))
def test_table_name_trailing_slash_invariant(base):
    p = "/tmp/y/" + base.replace("/", "_")
    assert _table_name_for_path(p) == _table_name_for_path(p + "/")


@given(
    st.lists(
        st.tuples(st.text(max_size=40), st.text(max_size=40)), max_size=10
    ),
    st.one_of(st.none(), st.text(min_size=1, max_size=20)),
)
def test_forced_catalog_always_wins(confs, forced):
    got = _catalog_from_confs(confs, forced)
    if forced:
        assert got == forced


def test_canon_cell_float_nan_and_decimal():
    import math
    from decimal import Decimal

    from tests.oracle_utils import canon_cell

    assert canon_cell(float("nan")) == canon_cell(None)
    assert canon_cell(Decimal("1.50")) == canon_cell(1.5)
    assert canon_cell([1, None, math.nan]) == canon_cell([1, None, None])


@settings(deadline=None)  # first duckdb call pays one-time import cost
@given(st.integers(min_value=1, max_value=10**12))
def test_k1_engine_parity_and_bounds(n):
    """The two-level coarse-k derivation must (a) compute the EXACT
    same k1 as its DuckDB SQL twin for any corpus size (both sides are
    GREATEST(2, CEIL(SQRT(ceil_div))) over IEEE doubles -- the
    engine-parity the oracle leans on), and (b) satisfy the structural
    bounds the scheme promises: k1 >= 2, k1^2 covers the linear leaf
    count (so per-cluster sub-seeding can reach the same granularity),
    and k1 never exceeds the linear k (the refinement only ever
    shrinks the broadcast)."""
    import duckdb

    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _TARGET_CLUSTER_SIZE,
        _k1_for,
        _k_for,
    )

    k1 = _k1_for(n)
    t = _TARGET_CLUSTER_SIZE
    sql = (
        f"SELECT GREATEST(2, CAST(CEIL(SQRT(CAST(({n} + {t - 1}) // {t}"
        f" AS DOUBLE))) AS BIGINT))"
    )
    assert k1 == duckdb.sql(sql).fetchone()[0]
    m = -(-n // t)  # linear leaf count
    assert k1 >= 2
    assert k1 * k1 >= m
    assert k1 <= _k_for(n)
