"""Semantic invariants of the round-13 operators (value-level
correctness is oracle-checked by the driver/driver_sim; these pin the
algebraic properties that survive fixture regeneration)."""

from __future__ import annotations

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.sources.datagen import (
    N_USERS,
    ORDERS_PER_USER,
)

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_order_count_distribution_is_a_single_spike(spark, sf_dir):
    """generate_orders deals every user exactly ORDERS_PER_USER orders
    with globally-unique order ids (reference mysql-init/01-setup.sql:
    186-239): the distribution collapses to ONE row covering all user
    ids -- any second row is generator drift. The product fan-out is
    hash-assigned, so it can only be bounded, never pinned exactly."""
    rows = _Q["order_count_distribution"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["orders_per_user"] == ORDERS_PER_USER
    assert r["n_users"] == N_USERS
    assert (r["min_user_id"], r["max_user_id"]) == (1, N_USERS)
    assert r["users_with_unique_ids"] == N_USERS
    assert 1 <= r["max_products_per_user"] <= ORDERS_PER_USER


def test_capped_semdedup_never_drops_more_than_uncapped(spark, sf_dir):
    """The cap can only REMOVE members from the pair join, so per
    cluster the capped variant's n_dropped is <= the uncapped
    benchmark-yardstick's (degraded recall, bounded work -- the
    documented trade, made executable)."""
    capped = {
        r["cluster"]: r
        for r in _Q["semantic_dedup_capped_stats"](spark, sf_dir).collect()
    }
    uncapped = {
        r["cluster"]: r
        for r in _Q["semantic_dedup_stats"](spark, sf_dir).collect()
    }
    assert set(capped) == set(uncapped)
    assert any(
        capped[c]["n_dropped"] < uncapped[c]["n_dropped"] for c in capped
    ) or all(
        capped[c]["n_dropped"] == uncapped[c]["n_dropped"] for c in capped
    )
    for c in capped:
        assert capped[c]["n_members"] == uncapped[c]["n_members"]
        assert capped[c]["n_dropped"] <= uncapped[c]["n_dropped"]


def test_leakage_safe_split_never_straddles(spark, sf_dir):
    """The cluster-keyed split's straddle count is structurally zero
    (split is a function of cluster id); docs conserve; every split
    label is one of the three."""
    rows = _Q["leakage_safe_split_stats"](spark, sf_dir).collect()
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    for r in rows:
        assert r["clusters_straddling"] == 0
        assert r["naive_clusters_straddling"] >= 0
        assert r["n_clusters"] <= r["n_docs"]


def test_cross_source_matrix_conserves_pair_stream(spark, sf_dir):
    """The matrix is a re-grouping of the SAME verified pair stream
    minhash_lsh_candidates emits: cell totals must conserve both the
    candidate and near-dup counts, and cells are canonically ordered."""
    rows = _Q["cross_source_dup_matrix"](spark, sf_dir).collect()
    vp = _Q["minhash_lsh_candidates"](spark, sf_dir)
    n_cand = vp.count()
    n_near = vp.filter("near_dup").count()
    assert sum(r["candidate_pairs"] for r in rows) == n_cand
    assert sum(r["near_dup_pairs"] for r in rows) == n_near
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert 0 <= r["near_dup_pairs"] <= r["candidate_pairs"]


def test_degree_histogram_conserves_corpus_and_handshake(spark, sf_dir):
    """The histogram must sum to the corpus (degree-0 rows keep the
    never-matched mass visible) and obey the handshake lemma: the
    degree-weighted sum equals twice the verified near-dup pair count
    of the same stream (minhash_lsh_candidates)."""
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    rows = _Q["neardup_degree_histogram"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    n_near = _Q["minhash_lsh_candidates"](spark, sf_dir).filter(
        "near_dup"
    ).count()
    assert sum(r["degree"] * r["n_docs"] for r in rows) == 2 * n_near
    assert all(r["degree"] >= 0 for r in rows)


def test_source_fair_threshold_keeps_top_quartile_per_source(spark, sf_dir):
    """The per-source cut keeps AT LEAST a quarter of every source
    (>= on the p75 cut can only add ties, never drop below the
    quantile mass), and never more than all of it; docs conserve."""
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    rows = _Q["quality_source_fair_threshold"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert 0 < r["kept_source_fair"] <= r["n_docs"]
        assert 0 <= r["kept_global"] <= r["n_docs"]
        # p75 cut with >= keeps at least the top quarter (ties only add)
        assert r["kept_source_fair"] >= r["n_docs"] // 4
        assert r["global_cut"] == rows[0]["global_cut"]


def test_cc_rounds_converged_on_fixture(spark, sf_dir, monkeypatch):
    """_CC_ROUNDS=4 min-label-propagation rounds are claimed sufficient
    for fixture near-dup graphs ('tiny diameters', dedup.py docstring)
    -- made executable: a FIFTH round must not change a single label.
    If the fixture ever grows a dup chain with diameter > 4, this fails
    loudly instead of the engine and its unrolled oracle agreeing on an
    identically-under-propagated labeling (hash-exactness would hide
    semantic non-convergence, since both sides run the same round
    count)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators import dedup

    def labels_at(rounds: int) -> dict:
        monkeypatch.setattr(dedup, "_CC_ROUNDS", rounds)
        _, _, labels = dedup._cascade_rep_labels(spark, sf_dir)
        return {r["doc_id"]: r["label"] for r in labels.collect()}

    assert labels_at(4) == labels_at(5)
