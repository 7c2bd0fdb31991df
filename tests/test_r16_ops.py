"""Semantic invariants of the round-16 operators (value-level
correctness is oracle-checked by the driver/driver_sim; these pin the
algebraic properties that survive fixture regeneration)."""

from __future__ import annotations

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
    _TOP_K,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
    load_table,
)

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_twolevel_filtered_recall_is_consistent_with_its_topk(
    spark, sf_dir
):
    """The recall row must be the literal overlap between
    ann_twolevel_filtered_topk's hit set and the filtered exact top-k:
    probe_hits <= exact_k <= k, recall == probe_hits/k, and every
    counted hit is a vec_id the topk op actually returned."""
    rec = _Q["ann_twolevel_filtered_recall"](spark, sf_dir).collect()
    assert len(rec) == 1
    r = rec[0]
    assert r["exact_k"] == _TOP_K  # the fixture label slice holds >= k
    assert 0 <= r["probe_hits"] <= r["exact_k"]
    assert abs(r["recall_at_k"] - round(r["probe_hits"] / _TOP_K, 4)) < 1e-9
    # overlap recomputed from the two ops' own outputs
    approx_ids = {
        row["vec_id"]
        for row in _Q["ann_twolevel_filtered_topk"](spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    assert qrow["vec_id"] == r["qid"]
    assert len(approx_ids) <= _TOP_K
    # the recall eval's hit count can never exceed the topk hit count
    assert r["probe_hits"] <= len(approx_ids)


def test_twolevel_filtered_recall_never_beats_unfiltered_probe_budget(
    spark, sf_dir
):
    """Sanity on the probe-budget ordering: the filtered two-level
    probe inspects a label-thinned slice of the same leaves the
    unfiltered two-level probe scans (wider coarse probe, same
    sub-probe width), so its recall is a real number in [0, 1] and the
    eval is non-degenerate on the fixtures (the probed leaves contain
    at least one label match -- the topk op returns rows)."""
    r = _Q["ann_twolevel_filtered_recall"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["recall_at_k"] <= 1.0
    topk_rows = _Q["ann_twolevel_filtered_topk"](spark, sf_dir).collect()
    assert len(topk_rows) > 0


def test_twolevel_sweep_is_monotone_and_consistent(spark, sf_dir):
    """Widening the coarse probe can only add candidates and hits; the
    width-_N_FILTERED_PROBES row must agree exactly with
    ann_twolevel_filtered_recall (same index, same query, same
    sub-probe width -- the sweep IS that eval swept)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _N_FILTERED_PROBES,
        _SWEEP_PROBE_WIDTHS,
    )

    rows = _Q["ann_twolevel_probe_sweep"](spark, sf_dir).collect()
    assert [r["n_probes"] for r in rows] == sorted(_SWEEP_PROBE_WIDTHS)
    for a, b in zip(rows, rows[1:]):
        assert b["n_candidates"] >= a["n_candidates"]
        assert b["probe_hits"] >= a["probe_hits"]
        assert b["recall_at_k"] >= a["recall_at_k"]
    for r in rows:
        assert 0 <= r["probe_hits"] <= _TOP_K
        assert (
            abs(r["recall_at_k"] - round(r["probe_hits"] / _TOP_K, 4))
            < 1e-9
        )
    by_w = {r["n_probes"]: r for r in rows}
    rec = _Q["ann_twolevel_filtered_recall"](spark, sf_dir).collect()[0]
    assert by_w[_N_FILTERED_PROBES]["probe_hits"] == rec["probe_hits"]
    assert by_w[_N_FILTERED_PROBES]["recall_at_k"] == rec["recall_at_k"]


def test_batch_recall_covers_the_batch_and_matches_single(spark, sf_dir):
    """One row per batch query (the B lowest vec_ids), each with the
    recall contract (hits <= exact_k <= k, recall = hits/k); the
    lowest-qid row must agree exactly with the single-query
    ann_twolevel_recall (same index, same probe widths, same query)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _N_BATCH_QUERIES,
    )

    rows = _Q["ann_twolevel_batch_recall"](spark, sf_dir).collect()
    assert len(rows) == _N_BATCH_QUERIES
    emb = load_table(spark, sf_dir, "embeddings")
    want_qids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy("vec_id")
        .limit(_N_BATCH_QUERIES)
        .collect()
    ]
    assert [r["qid"] for r in rows] == want_qids
    for r in rows:
        assert r["exact_k"] == _TOP_K
        assert 0 <= r["probe_hits"] <= r["exact_k"]
        assert (
            abs(r["recall_at_k"] - round(r["probe_hits"] / _TOP_K, 4))
            < 1e-9
        )
    single = _Q["ann_twolevel_recall"](spark, sf_dir).collect()[0]
    assert rows[0]["qid"] == single["qid"]
    assert rows[0]["probe_hits"] == single["probe_hits"]
    assert rows[0]["recall_at_k"] == single["recall_at_k"]


def test_pq_adc_rerank_recovers_at_least_adc(spark, sf_dir):
    """Two-stage serving contract: rerank selects by TRUE distance
    within the ADC top-_PQ_RERANK candidates, and adc_topk is a subset
    of those candidates, so rerank_hits >= adc_hits always; both
    recalls = hits/k; exact_k fills on the fixtures."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _PQ_TOP_K,
    )

    rows = _Q["pq_adc_topk_recall"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["exact_k"] == _PQ_TOP_K
    assert 0 <= r["adc_hits"] <= r["rerank_hits"] <= r["exact_k"]
    assert abs(r["adc_recall"] - round(r["adc_hits"] / _PQ_TOP_K, 4)) < 1e-9
    assert (
        abs(r["rerank_recall"] - round(r["rerank_hits"] / _PQ_TOP_K, 4))
        < 1e-9
    )


def test_kcenter_sample_covers_everything_with_distinct_centers(
    spark, sf_dir
):
    """Gonzalez contract: one row per pick in pick order, distinct
    center ids, every corpus vector assigned to exactly one center
    (memberships sum to n), each center covers itself (radius >=
    avg_dist >= 0; the center's own distance is 0)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _KCENTER_PICKS,
    )

    rows = _Q["greedy_kcenter_sample"](spark, sf_dir).collect()
    assert [r["pick_order"] for r in rows] == list(
        range(_KCENTER_PICKS + 1)
    )
    assert len({r["center_id"] for r in rows}) == len(rows)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n
    for r in rows:
        assert r["n_members"] >= 1  # fixtures: all vectors distinct
        assert 0.0 <= r["avg_dist"] <= r["radius"]


def test_epoch_plan_conserves_budget_and_caps(spark, sf_dir):
    """Allocation arithmetic: weights sum to ~1; target_tokens sum to
    ~budget (BUDGET_X x corpus tokens); epochs_capped = min(needed,
    MAX); served = unique * capped; shortfall = max(target - served, 0)
    and positive exactly where the cap binds."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.sampling import (
        _EPOCH_BUDGET_X,
        _MAX_EPOCHS,
    )

    rows = _Q["data_constrained_epochs"](spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    total_unique = sum(r["unique_tokens"] for r in rows)
    assert (
        abs(
            sum(r["target_tokens"] for r in rows)
            - _EPOCH_BUDGET_X * total_unique
        )
        < 1.0
    )
    for r in rows:
        assert r["epochs_capped"] <= _MAX_EPOCHS + 1e-9
        assert r["epochs_capped"] <= r["epochs_needed"] + 1e-9
        # epochs_capped is snapped to 4 decimals AFTER served_tokens
        # was computed from the raw value -- allow unique * 5e-5 slack
        tol = r["unique_tokens"] * 5.1e-5 + 0.02
        assert (
            abs(r["served_tokens"] - r["unique_tokens"] * r["epochs_capped"])
            < tol
        )
        want_short = max(r["target_tokens"] - r["served_tokens"], 0.0)
        assert abs(r["shortfall_tokens"] - want_short) < 0.05
        if r["epochs_needed"] > _MAX_EPOCHS + 1e-9:
            assert r["shortfall_tokens"] > 0.0
        else:
            assert r["shortfall_tokens"] < 0.02


def test_curriculum_bins_partition_the_corpus(spark, sf_dir):
    """Quartile binning contract: bins ascend with disjoint token
    ranges (max_toks of bin b < min_toks of bin b+1 for non-empty
    bins), doc counts sum to the corpus, token shares sum to ~1, and
    the non-empty quartile bins hold roughly a quarter of non-empty
    docs each (exact quartiles over n>0 docs)."""
    rows = _Q["curriculum_difficulty_bins"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    ranked = [r for r in rows if r["bin"] > 0]
    for a, b in zip(ranked, ranked[1:]):
        assert a["max_toks"] < b["min_toks"]
    n_nonempty = sum(r["n_docs"] for r in ranked)
    for r in ranked:
        assert r["n_docs"] >= n_nonempty // 4 - max(
            2, n_nonempty // 20
        )


def test_curriculum_phase_plan_widens_and_converges(spark, sf_dir):
    """Progressive widening: available tokens are non-decreasing in
    phase; the last phase sees the whole non-empty corpus (so its
    quarter-budget always fits); epochs_over_available is
    non-increasing and equals budget/available."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.curriculum import (
        _N_PHASES,
    )

    rows = _Q["curriculum_phase_plan"](spark, sf_dir).collect()
    assert [r["phase"] for r in rows] == list(range(1, _N_PHASES + 1))
    av = [r["available_tokens"] for r in rows]
    assert av == sorted(av)
    bins = _Q["curriculum_difficulty_bins"](spark, sf_dir).collect()
    nonempty_total = sum(
        r["total_tokens"] for r in bins if r["bin"] > 0
    )
    assert av[-1] == nonempty_total
    assert rows[-1]["budget_fits"]
    eo = [r["epochs_over_available"] for r in rows]
    assert eo == sorted(eo, reverse=True)
    for r in rows:
        if r["available_tokens"]:
            want = round(
                r["phase_budget"] / r["available_tokens"], 4
            )
            assert abs(r["epochs_over_available"] - want) < 1e-3
