"""Semantic invariants of the round-14 operators (value-level
correctness is oracle-checked by the driver/driver_sim; these pin the
algebraic properties that survive fixture regeneration)."""

from __future__ import annotations

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
    _TARGET_CLUSTER_SIZE,
    _k1_for,
    _k_for,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
    load_table,
)

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def test_twolevel_kmeans_conserves_and_bounds_leaves(spark, sf_dir):
    """Every vector lands in exactly one (cluster, sub) leaf; coarse
    cluster ids stay under k1 = ceil(sqrt(ceil(n/target))); each coarse
    cluster's sub ids stay under ceil(cluster_size/target) (sub seeds
    are drawn per cluster, so the leaf fan-out is size-proportional,
    never global)."""
    rows = _Q["embedding_kmeans_twolevel_profile"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n
    k1 = _k1_for(n)
    sizes: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["cluster"] < k1
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + r["n_vectors"]
        assert r["n_vectors"] >= 1
        assert r["avg_dist2"] >= 0.0
    for r in rows:
        # sub ids index the md5-ranked seeds of THIS cluster only
        assert 0 <= r["sub"] < _ceil_div(
            sizes[r["cluster"]], _TARGET_CLUSTER_SIZE
        )


def test_embedding_decontamination_agrees_with_pair_stream(spark, sf_dir):
    """The semantic decontamination scan is the asymmetric re-grouping
    of the SAME banded-LSH near-dup stream: per label, its contaminated
    count must equal the number of distinct NON-probe endpoints among
    embedding_near_dup_pairs rows with exactly one probe endpoint
    (probe = vec_id % _EPROBE_MOD == 0). Corpus/probe sizes conserve;
    contaminated is bounded by both its candidates and its corpus."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _EPROBE_MOD,
    )

    rows = _Q["embedding_decontamination_scan"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_corpus"] + r["n_probes"] for r in rows) == n
    expected: dict[int, set[int]] = {}
    for p in _Q["embedding_near_dup_pairs"](spark, sf_dir).collect():
        pa = p["vec_a"] % _EPROBE_MOD == 0
        pb = p["vec_b"] % _EPROBE_MOD == 0
        if pa != pb:
            corpus_end = p["vec_b"] if pa else p["vec_a"]
            expected.setdefault(p["label"], set()).add(corpus_end)
    for r in rows:
        assert r["contaminated"] == len(expected.get(r["label"], set()))
        # r14 ADVICE: assert the bound directly (the old `or
        # contaminated == 0` clause swallowed it whenever 0, and
        # candidate_pairs can never be negative).
        assert 0 <= r["contaminated"] <= min(
            r["n_corpus"], r["candidate_pairs"]
        )
        if r["n_corpus"] == 0:
            assert r["contamination_rate"] is None


def test_twolevel_semdedup_accounting(spark, sf_dir):
    """Per-leaf accounting closes (kept + dropped == members), every
    leaf keeps its lowest-id member (keep-first can never drop it),
    and members conserve to the corpus."""
    rows = _Q["semantic_dedup_twolevel_stats"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"]
        assert r["n_kept"] >= 1
        assert 0.0 < r["kept_frac"] <= 1.0


def test_twolevel_recall_is_consistent(spark, sf_dir):
    """One row; exact side always fills k; hits bounded by k and
    consistent with the reported recall (count/k snapped to 4dp)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _TOP_K,
    )

    rows = _Q["ann_twolevel_recall"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["exact_k"] == _TOP_K
    assert 0 <= r["probe_hits"] <= _TOP_K
    assert abs(r["recall_at_k"] - r["probe_hits"] / _TOP_K) < 1e-9


def test_twolevel_kmeans_does_less_assignment_work(spark, sf_dir):
    """The refinement's raison d'etre, made executable: total distance
    folds (level-1 n*k1 + level-2 sum(cluster_size * n_subs_used))
    must undercut the linear-k op's n*k folds. The margin grows with n
    (sqrt vs linear in k); at fixture scale it is already strict."""
    rows = _Q["embedding_kmeans_twolevel_profile"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    sizes: dict[int, int] = {}
    subs: dict[int, int] = {}
    for r in rows:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + r["n_vectors"]
        subs[r["cluster"]] = max(subs.get(r["cluster"], 0), r["sub"] + 1)
    level1 = n * _k1_for(n) * 2  # _ITERS assignment passes
    level2 = sum(
        sizes[c] * _ceil_div(sizes[c], _TARGET_CLUSTER_SIZE) for c in sizes
    )
    linear = n * _k_for(n) * 2
    assert level1 + level2 < linear, (level1, level2, linear)
