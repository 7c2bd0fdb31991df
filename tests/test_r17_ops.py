"""Semantic invariants of the round-17 operators (value-level
correctness is oracle-checked by the driver/driver_sim and the
randomized-corpus suite; these pin the algebraic properties)."""

from __future__ import annotations

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
    _IVFPQ_PROBES,
    _PQ_TOP_K,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
    load_table,
)

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_ivfpq_recall_bounds_and_pruning(spark, sf_dir):
    """IVF-PQ invariants on the real fixture: the probed-lists scan
    touches strictly fewer rows than the corpus (the pruning dividend),
    re-rank can only RECOVER candidates the ADC stage surfaced (both
    rank the same candidate pool, so rerank_hits is a reordering of at
    most the same `cand` set), and recalls are consistent ratios."""
    rows = _Q["ann_ivfpq_topk_recall"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n = load_table(spark, sf_dir, "embeddings").count()
    n_lists = (
        load_table(spark, sf_dir, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    if n_lists > _IVFPQ_PROBES:
        assert r["scanned"] < n - 1, "probing must prune the scan"
    assert 0 < r["scanned"] <= n - 1
    assert r["exact_k"] == min(_PQ_TOP_K, n - 1)
    assert 0 <= r["adc_hits"] <= r["exact_k"]
    assert 0 <= r["rerank_hits"] <= r["exact_k"]
    assert abs(r["adc_recall"] - round(r["adc_hits"] / _PQ_TOP_K, 4)) < 1e-9
    assert (
        abs(r["rerank_recall"] - round(r["rerank_hits"] / _PQ_TOP_K, 4))
        < 1e-9
    )


def test_ivfpq_vs_flat_adc_consistency(spark, sf_dir):
    """IVF-PQ and flat PQ-ADC agree on the shared contract: same query
    row, recalls bounded by the exact-k pool. NOTE (r17 ADVICE): the
    tempting invariant ivf.rerank_recall <= flat.rerank_recall is NOT a
    theorem -- coarse pruning drops ADC-distractor rows from unprobed
    lists, which can let a true neighbor into IVF's bounded re-rank
    candidate pool that flat's global ADC top-R crowded out. So the
    cross-op relation is pinned only as a fixture-specific regression
    value below (expected to move if fixtures or PQ constants change,
    in either direction)."""
    flat = _Q["pq_adc_topk_recall"](spark, sf_dir).collect()[0]
    ivf = _Q["ann_ivfpq_topk_recall"](spark, sf_dir).collect()[0]
    assert ivf["qid"] == flat["qid"]  # same first-vec_id query row
    for r in (flat, ivf):
        assert 0 <= r["rerank_hits"] <= r["exact_k"]
        assert 0 <= r["adc_hits"] <= r["exact_k"]
    # Fixture-pinned regression values (sf0.001 fixtures, _PQ_* consts
    # as of r17): a silent change to either op's candidate plumbing
    # shows up here first. Not an IVF<=flat ordering claim -- update
    # these pins deliberately if fixtures or PQ constants change.
    assert abs(flat["rerank_recall"] - 0.2) < 1e-9
    assert abs(ivf["rerank_recall"] - 0.1) < 1e-9


def test_paraphrase_pairs_directed_semantics(spark, tmp_path):
    """Crafted dual corpus with a KNOWN answer: docs 1/2 share an
    embedding direction but have disjoint texts (the paraphrase pair);
    docs 3/4 share BOTH embedding and text (lexical dup — excluded by
    the Jaccard gate); docs 5/6 share text only (no embedding
    collision at cos >= 0.5 — never a candidate)."""
    d = str(tmp_path / "sf")
    dim = 64

    def vec(*head):
        v = [0.0] * dim
        for i, x in enumerate(head):
            v[i] = float(x)
        return v

    emb = [
        (1, vec(1, 2, 3), 0),
        (2, vec(2, 4, 6), 0),        # same direction as 1 (cos 1.0)
        (3, vec(5, 0, 1), 1),
        (4, vec(5, 0, 1), 1),        # replica of 3
        (5, vec(1, 0, 0), 2),
        (6, vec(0, 0, 0, 0, 7), 2),  # orthogonal to 5
    ]
    docs = [
        (1, "alpha beta gamma delta words one", "en", "web", 32),
        (2, "totally different phrasing same idea", "en", "web", 36),
        (3, "identical sentence here three times", "en", "web", 35),
        (4, "identical sentence here three times", "en", "web", 35),
        (5, "twin text twin text twin", "en", "web", 24),
        (6, "twin text twin text twin", "en", "web", 24),
    ]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"])
        for r in _Q["paraphrase_mining_pairs"](spark, d).collect()
    }
    assert (1, 2) in got, "semantically-near lexically-far pair must mine"
    assert (3, 4) not in got, "lexical dup must be excluded by the gate"
    assert (5, 6) not in got, "lexically-near semantically-far never a pair"


def test_pq_dlit_rejects_non_finite():
    """r19 ADVICE: a degenerate embedding (inf/nan component) must fail
    at expression-build time with a clear message, not as a Spark SQL
    parse error on 'infD'/'nanD' text."""
    import pytest

    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (  # noqa: E501
        _pq_dlit,
    )

    assert _pq_dlit(1.5) == "1.5D"
    assert _pq_dlit(-0.25) == "-0.25D"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite PQ literal"):
            _pq_dlit(bad)
