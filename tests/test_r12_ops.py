"""Semantic invariants of the round-12 operators (value-level
correctness is oracle-checked by the driver/driver_sim; these pin the
algebraic properties that survive fixture regeneration)."""

from __future__ import annotations

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.sources.datagen import (
    N_USERS,
    SESSIONS_PER_USER,
)

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_session_count_distribution_is_a_single_spike(spark, sf_dir):
    """generate_sessions deals every user exactly SESSIONS_PER_USER
    sessions with unique tokens (reference mysql-init/01-setup.sql:
    242-289): the distribution collapses to ONE row covering all user
    ids -- any second row is generator drift."""
    rows = _Q["session_count_distribution"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sessions_per_user"] == SESSIONS_PER_USER
    assert r["n_users"] == N_USERS
    assert (r["min_user_id"], r["max_user_id"]) == (1, N_USERS)
    assert r["users_with_unique_tokens"] == N_USERS


def test_user_lifetime_stats_invariants(spark, sf_dir):
    """Per-user lifetime rows must conserve the event count, order their
    extremes, and bound intensity: active_days in [1, n_events] implies
    events_per_active_day >= 1."""
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    rows = _Q["user_lifetime_stats"](spark, sf_dir).collect()
    assert rows
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    for r in rows:
        assert r["first_seen_epoch"] <= r["last_seen_epoch"]
        assert r["lifetime_secs"] == r["last_seen_epoch"] - r["first_seen_epoch"]
        assert 1 <= r["active_days"] <= r["n_events"]
        assert r["events_per_active_day"] >= 1.0
