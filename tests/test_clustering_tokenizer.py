"""Semantic invariants of the round-8 clustering / tokenizer-induction
operators (their value-level correctness is oracle-checked in
test_correctness.py; these pin the algorithmic properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import _k_for
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_kmeans_partitions_every_vector(spark, sf_dir):
    rows = _Q["embedding_kmeans_profile"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    k = _k_for(n_total)
    assert sum(r["n_vectors"] for r in rows) == n_total
    assert len(rows) <= k
    assert all(0 <= r["cluster"] < k for r in rows)
    assert all(r["avg_dist2"] >= 0 for r in rows)


def test_semantic_dedup_accounting_closes(spark, sf_dir):
    rows = _Q["semantic_dedup_stats"](spark, sf_dir).collect()
    assert rows, "expected at least one cluster"
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"], r
        assert r["n_kept"] >= 1, r  # keep-first can never empty a cluster
    # the synthetic corpus is calibrated to produce SOME near-dups
    assert any(r["n_dropped"] > 0 for r in rows)


def test_bpe_merge_counts_monotone_nonincreasing(spark, sf_dir):
    """Each merge's count is the max over available pairs; merging pair
    P with count c can only create pairs of count <= c, so the selected
    counts must be non-increasing -- the core BPE training invariant."""
    rows = _Q["bpe_learn_merges"](spark, sf_dir).orderBy("merge_rank").collect()
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    for r in rows:
        assert r["merged"] == r["sym_a"] + r["sym_b"], r


def test_bpe_top_pair_is_learned_first(spark, sf_dir):
    top = _Q["bpe_pair_frequencies"](spark, sf_dir).limit(1).collect()[0]
    first = (
        _Q["bpe_learn_merges"](spark, sf_dir)
        .filter(F.col("merge_rank") == 1)
        .collect()[0]
    )
    assert (top["sym_a"], top["sym_b"], top["pair_count"]) == (
        first["sym_a"],
        first["sym_b"],
        first["pair_count"],
    )


def test_stratified_quota_respects_population(spark, sf_dir):
    for r in _Q["stratified_quota_sample"](spark, sf_dir).collect():
        assert 0 <= r["sampled_docs"] <= r["total_docs"], r
        assert 0 <= r["threshold_ppm"] <= 1_000_000, r
        # a stratum at-or-under quota keeps everything
        if r["threshold_ppm"] == 1_000_000:
            assert r["sampled_docs"] == r["total_docs"], r


def test_semantic_dedup_apply_readback_closes(spark, sf_dir):
    """The applied twin's identity: plan-side members must equal
    readback-kept + plan-dropped per cluster, and the applied decisions
    must agree with the stats op."""
    rows = {
        r["cluster"]: r
        for r in _Q["semantic_dedup_apply"](spark, sf_dir).collect()
    }
    stats = {
        r["cluster"]: r
        for r in _Q["semantic_dedup_stats"](spark, sf_dir).collect()
    }
    assert rows.keys() == stats.keys()
    for c, r in rows.items():
        assert r["kept_readback"] + r["n_dropped"] == r["n_members"], r
        assert r["n_dropped"] == stats[c]["n_dropped"], (r, stats[c])


def test_bpe_replace_three_passes_reach_fixpoint_and_match_duckdb():
    """Pin the merge-application contract without Spark: (1) DuckDB's
    literal replace() behaves exactly like Python str.replace (all
    non-overlapping occurrences, scanning left to right), and (2) three
    passes reach the fixpoint for every symbol sequence up to 12
    symbols over a worst-case tiny alphabet -- the longest word in any
    fixture produces 9. Spark's SQL replace shares the same contract
    (exercised end-to-end by the bpe_learn_merges oracle match)."""
    import itertools

    import duckdb

    con = duckdb.connect()
    checked = 0
    for n in range(2, 13):
        # worst case for overlap chains: all symbols drawn from {a, b}.
        # Exhaustive through n=9; lengths 10-12 sample every 7th
        # sequence (deterministic stride) so the claimed 12-symbol bound
        # is actually exercised without a 25k-case DuckDB loop.
        seqs = itertools.product("ab", repeat=n)
        if n > 9:
            seqs = itertools.islice(seqs, 0, None, 7)
        for seq in seqs:
            s = " " + " ".join(seq) + " </w> "
            for pat_a, pat_b in (("a", "b"), ("a", "a"), ("b", "a")):
                pat = f" {pat_a} {pat_b} "
                rep = f" {pat_a}{pat_b} "
                three = s
                for _ in range(3):
                    three = three.replace(pat, rep)
                assert three.replace(pat, rep) == three, (s, pat, three)
                got = con.execute(
                    "SELECT replace(?, ?, ?)", [s, pat, rep]
                ).fetchone()[0]
                assert got == s.replace(pat, rep), (s, pat)
                checked += 1
    assert checked > 3000


def test_order_value_percentiles_are_monotone(spark, sf_dir):
    for r in _Q["order_value_percentiles"](spark, sf_dir).collect():
        seq = [r["min_price"], r["p25"], r["p50"], r["p75"], r["p90"],
               r["p99"], r["max_price"]]
        assert seq == sorted(seq), r


def test_semantic_dedup_cascade_accounting_closes(spark, sf_dir):
    rows = _Q["semantic_dedup_cascade_stats"](spark, sf_dir).collect()
    assert rows
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["vectors_total"] for r in rows) == n_total
    for r in rows:
        assert r["vectors_total"] >= r["n_reps"], r
        assert r["removed_exact"] == r["vectors_total"] - r["n_reps"], r
        assert 0 <= r["reps_dropped"] < r["n_reps"] or r["n_reps"] == 1, r
        assert r["removed_semantic"] >= r["reps_dropped"], r


def test_bpe_tokenize_compression_bounded(spark, sf_dir):
    """Applying merges can only SHRINK the symbol stream: per lang,
    bpe_tokens <= char_tokens (the char+marker baseline), and each word
    still tokenizes to >= 1 symbol."""
    rows = _Q["bpe_tokenize_corpus_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bpe_tokens"] <= r["char_tokens"], r
        assert r["bpe_tokens"] >= r["words"], r
        assert r["tokens_per_word"] >= 1.0, r


def test_ann_kmeans_ivf_subset_of_exact_topk(spark, sf_dir):
    """IVF results are drawn from the probed clusters only; every
    returned neighbor must also score correctly: cos_sim descending,
    fully tie-broken, k rows, and no result may beat the probed-cluster
    best (internal consistency)."""
    rows = _Q["ann_kmeans_ivf_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert len({r["vec_id"] for r in rows}) == 10
    # probed clusters: at most _N_PROBES distinct
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _N_PROBES,
    )

    assert len({r["cluster"] for r in rows}) <= _N_PROBES


def test_streaming_vector_assign_matches_batch(spark, sf_dir):
    """The streamed assignment rollup must equal the batch k-means
    profile's (cluster, n_vectors) exactly -- same index, same argmin."""
    streamed = {
        r["cluster"]: (r["n_vectors"], r["min_vec_id"])
        for r in _Q["streaming_vector_assign"](spark, sf_dir).collect()
    }
    batch = {
        r["cluster"]: (r["n_vectors"], r["min_vec_id"])
        for r in _Q["embedding_kmeans_profile"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_kmeans_k_grows_with_corpus_size():
    """The SemDeDup blocking discipline: k ~ n / target cluster size,
    floored at _K_MIN, so the within-cluster pair join stays bounded at
    any corpus size (r9 VERDICT item 2)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _K_MIN,
        _TARGET_CLUSTER_SIZE,
    )

    assert _k_for(0) == _K_MIN
    assert _k_for(_K_MIN * _TARGET_CLUSTER_SIZE) == _K_MIN
    # strictly growing past the floor, one cluster per target-size slab
    assert _k_for(100 * _TARGET_CLUSTER_SIZE) == 100
    assert _k_for(100 * _TARGET_CLUSTER_SIZE + 1) == 101
    # bounded largest-cluster work under a uniform assignment
    n = 10**9
    assert n / _k_for(n) <= _TARGET_CLUSTER_SIZE
