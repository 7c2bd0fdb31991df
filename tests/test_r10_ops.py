"""Semantic invariants of the round-10 operators (value-level
correctness is oracle-checked by the driver/driver_sim; these pin the
algebraic properties that survive fixture regeneration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.functions import tokens
from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_promo_share_is_a_percentage_of_one_pass(spark, sf_dir):
    row = _Q["promo_revenue_share"](spark, sf_dir).first()
    assert row["n_lines"] > 0
    assert 0.0 <= row["promo_share"] <= 100.0
    assert 0.0 <= row["promo_revenue"] <= row["total_revenue"]


def test_disjunctive_arms_partition_the_result(spark, sf_dir):
    """Each arm alone must be a subset of the disjunction; the arms are
    brand-disjoint, so their counts sum exactly to the union's."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.analytics import (
        _DISJ_ARMS,
    )

    total = _Q["disjunctive_pred_revenue"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    arm_counts = []
    for b, slo, shi, qlo, qhi in _DISJ_ARMS:
        arm_counts.append(
            j.filter(
                (F.col("p_brand") == b)
                & F.col("p_size").between(slo, shi)
                & F.col("l_quantity").between(qlo, qhi)
            ).count()
        )
    assert all(c > 0 for c in arm_counts), arm_counts
    assert sum(arm_counts) == total["n_lines"]


def test_bigram_logprob_bounds_and_counts(spark, sf_dir):
    rows = _Q["bigram_logprob_quality"](spark, sf_dir).collect()
    assert rows
    # Laplace-smoothed conditional probs are < 1 => logs strictly < 0
    assert all(r["avg_logprob"] < 0 for r in rows)
    expected = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") >= 2)
        .agg(F.sum(F.col("n") - 1))
        .first()[0]
    )
    assert sum(r["n_bigrams"] for r in rows) == expected


def test_zipf_slope_is_negative(spark, sf_dir):
    row = _Q["zipf_slope_top_terms"](spark, sf_dir).first()
    # rank-frequency is always non-increasing => fitted slope < 0; the
    # 31-word synthetic codebook sits far above natural language's ~-1,
    # which is exactly the template-spam diagnosis the op exists for
    assert row["n_terms"] >= 2
    assert -3.0 < row["zipf_slope"] < 0.0


def test_vocab_growth_is_monotone_and_closes(spark, sf_dir):
    rows = _Q["vocab_growth_curve"](spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == list(range(1, len(rows) + 1))
    cums = [r["vocab_cum"] for r in rows]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert cums[-1] == n_vocab
    assert sum(r["new_terms"] for r in rows) == n_vocab


def test_streaming_dedup_swallows_the_replay(spark, sf_dir):
    """The sink rollup must equal the batch rollup of the UNIQUE events
    even though a whole chunk was delivered twice."""
    got = {
        r["event_type"]: (r["n_events"], r["n_users"])
        for r in _Q["streaming_dedup_exactly_once"](spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    want = {
        r["event_type"]: (r["n"], r["u"])
        for r in events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("u"),
        )
        .collect()
    }
    assert got == want


def test_pca_top2_components_are_near_orthogonal(spark, sf_dir):
    """Projection deflation must leave the second direction ~orthogonal
    to the first; the 4-decimal component snapping bounds the residual
    dot product far below any meaningful correlation."""
    rows = _Q["embedding_pca_top2"](spark, sf_dir).collect()
    v1 = {r["dim"]: r["component"] for r in rows if r["comp"] == 1}
    v2 = {r["dim"]: r["component"] for r in rows if r["comp"] == 2}
    assert len(v1) == len(v2) == 64
    dot = sum(v1[d] * v2[d] for d in v1)
    n1 = sum(x * x for x in v1.values()) ** 0.5
    n2 = sum(x * x for x in v2.values()) ** 0.5
    assert abs(n1 - 1) < 1e-2 and abs(n2 - 1) < 1e-2
    assert abs(dot) / (n1 * n2) < 0.05, dot


# -- late-r10 additions: sketch calibration, CUBE, BM25 --------------------


def test_minhash_calibration_covers_all_candidates(spark, sf_dir):
    """The calibration curve partitions EXACTLY the LSH candidate set:
    total pairs across estimate levels equals the verified-candidate
    count, every level's estimate is consistent with >=1 shared band
    (>=4 matching components), and the mean absolute error is a real
    probability gap (inside [0, 1])."""
    rows = _Q["minhash_estimate_calibration"](spark, sf_dir).collect()
    assert rows
    n_candidates = _Q["minhash_lsh_candidates"](spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == n_candidates
    for r in rows:
        assert 4 <= r["est_matches"] <= 16
        assert abs(r["est_jaccard"] - r["est_matches"] / 16.0) < 1e-12
        assert 0.0 <= r["avg_abs_err"] <= 1.0
        assert 0.0 <= r["avg_true_jaccard"] <= 1.0


def test_cube_contains_rollup_and_the_status_margin(spark, sf_dir):
    """CUBE = ROLLUP's sets plus the per-status margin: every rollup row
    appears in the cube verbatim, the extra rows are exactly the
    (status, g_year=1, g_status=0) subtotals, and the grand total in
    both equals the orders rowcount."""
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    cube = _Q["revenue_cube_levels"](spark, sf_dir).collect()
    rollup = _Q["revenue_rollup_levels"](spark, sf_dir).collect()
    key = lambda r: (  # noqa: E731
        r["order_year"], r["status"], r["g_year"], r["g_status"],
        r["orders"], r["revenue"],
    )
    cube_keys = {key(r) for r in cube}
    assert {key(r) for r in rollup} <= cube_keys
    extras = [r for r in cube if key(r) not in {key(x) for x in rollup}]
    assert extras and all(
        r["g_year"] == 1 and r["g_status"] == 0 for r in extras
    )
    n_orders = load_table(spark, sf_dir, "orders").count()
    grand = [r for r in cube if r["g_year"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1 and grand[0]["orders"] == n_orders


def test_bm25_scores_rank_and_match(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.text import (
        _BM25_QUERY,
        _BM25_TOP,
    )

    rows = _Q["bm25_topk_search"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= _BM25_TOP
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] > 0 for r in rows)
    assert all(1 <= r["n_terms_matched"] <= len(_BM25_QUERY) for r in rows)
    # the top hit must actually contain a query term
    docs = load_table(spark, sf_dir, "documents")
    top_text = (
        docs.filter(F.col("doc_id") == rows[0]["doc_id"]).first()["text"].lower()
    )
    assert any(t in top_text for t in _BM25_QUERY)


# -- TPC-H Q6/Q9/Q12/Q13/Q17 shapes + RRF hybrid fusion --------------------


def test_q6_is_a_subset_sum_of_lineitem(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q6_DISC_HI,
        _Q6_DISC_LO,
        _Q6_HI,
        _Q6_LO,
        _Q6_MAX_QTY,
    )

    row = _Q["forecast_revenue_change"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    n = li.filter(
        (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
        & (F.col("l_discount") >= _Q6_DISC_LO)
        & (F.col("l_discount") <= _Q6_DISC_HI)
        & (F.col("l_quantity") < _Q6_MAX_QTY)
    ).count()
    assert row["n_lines"] == n > 0
    assert row["revenue_delta"] > 0


def test_q9_profit_is_below_revenue(spark, sf_dir):
    rows = _Q["product_profit_by_nation"](spark, sf_dir).collect()
    assert rows
    assert all(r["nation"].startswith("NATION_") for r in rows)
    assert all(1995 <= r["order_year"] <= 2001 for r in rows)
    # years sort descending within each nation
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r["order_year"])
    for years in by_nation.values():
        assert years == sorted(years, reverse=True)


def test_q12_buckets_partition_the_ship_year(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q12_HI,
        _Q12_LO,
    )

    rows = _Q["ship_lag_priority_counts"](spark, sf_dir).collect()
    assert {r["ship_bucket"] for r in rows} <= {"FAST", "SLOW", "LATE"}
    li = load_table(spark, sf_dir, "lineitem")
    n = li.filter(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
    ).count()
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == n


def test_q13_histogram_accounts_for_every_customer(spark, sf_dir):
    rows = _Q["custdist_histogram"](spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    assert all(r["c_count"] >= 0 for r in rows)
    dists = [r["custdist"] for r in rows]
    assert dists == sorted(dists, reverse=True)


def test_q17_small_qty_revenue_bounds(spark, sf_dir):
    row = _Q["small_qty_part_revenue"](spark, sf_dir).first()
    assert row["n_lines"] >= 0
    if row["n_lines"]:
        assert row["avg_yearly"] > 0


def test_rrf_fusion_is_consistent_with_both_retrievers(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.text import (
        _RRF_K,
        _RRF_N,
        _RRF_TOP,
    )

    rows = _Q["rrf_hybrid_search"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= _RRF_TOP
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        br, cr = r["bm25_rank"], r["cos_rank"]
        assert br is not None or cr is not None
        expected = (1.0 / (_RRF_K + br) if br else 0.0) + (
            1.0 / (_RRF_K + cr) if cr else 0.0
        )
        assert abs(r["rrf_score"] - expected) < 1e-6
        for rank in (br, cr):
            if rank is not None:
                assert 1 <= rank <= _RRF_N
    # a doc present in BOTH lists at rank 1 must dominate any single-list doc
    both = [r for r in rows if r["bm25_rank"] and r["cos_rank"]]
    single = [r for r in rows if not (r["bm25_rank"] and r["cos_rank"])]
    if both and single:
        assert rows[0]["rrf_score"] >= single[0]["rrf_score"]


# -- winnowing fingerprints + product quantization --------------------------


def test_winnowing_density_matches_theory(spark, sf_dir):
    """Winnowing selects ~2/(w+1) of grams as fingerprints on random
    text; every doc must satisfy the hard bounds 1 <= fps <= grams and
    fps <= grams - w + 1 for docs with at least one full window."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.dedup import (
        _WIN_W,
    )

    rows = _Q["winnowing_fingerprints"](spark, sf_dir).collect()
    assert rows
    dens = []
    for r in rows:
        assert 1 <= r["n_fingerprints"] <= r["n_grams"]
        if r["n_grams"] >= _WIN_W:
            assert r["n_fingerprints"] <= r["n_grams"] - _WIN_W + 1
            dens.append(r["fp_density"])
    avg = sum(dens) / len(dens)
    theory = 2.0 / (_WIN_W + 1)
    assert 0.5 * theory < avg < 2.0 * theory, avg


def test_winnowing_pairs_are_exactly_recomputable(spark, sf_dir):
    """Every reported pair satisfies the two gates, and the shared-
    fingerprint count / overlap are EXACTLY what a direct recomputation
    of the two docs' capped fingerprint sets gives (the fixture corpus
    has no exact normalized duplicates, so these 20+ pairs are genuine
    partial-overlap near-dups -- the case winnowing exists for)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.dedup import (
        _WIN_CAP,
        _WIN_MIN_OVERLAP,
        _WIN_MIN_SHARED,
        _winnowed,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in _Q["winnowing_neardup_pairs"](spark, sf_dir).collect()
    }
    assert pairs
    for (a, b), r in pairs.items():
        assert a < b
        assert r["shared_fps"] >= _WIN_MIN_SHARED
        assert _WIN_MIN_OVERLAP - 1e-9 <= r["overlap"] <= 1.0 + 1e-9
    w = {
        r["doc_id"]: set(r["fps"])
        for r in _winnowed(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    fp_df = {}
    for fps in w.values():
        for fp in fps:
            fp_df[fp] = fp_df.get(fp, 0) + 1
    kept = {fp for fp, n in fp_df.items() if 2 <= n <= _WIN_CAP}
    for (a, b), r in pairs.items():
        shared = len(w[a] & w[b] & kept)
        assert shared == r["shared_fps"], (a, b)
        expect = shared / min(len(w[a]), len(w[b]))
        assert abs(r["overlap"] - expect) < 1e-4, (a, b)


def test_pq_assignment_covers_every_vector(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
    )

    rows = _Q["pq_codebook_stats"](spark, sf_dir).collect()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    by_sub = {}
    for r in rows:
        assert 0 <= r["subspace"] < _PQ_M and 0 <= r["code"] < _PQ_K
        assert r["avg_sqdist"] >= 0
        by_sub[r["subspace"]] = by_sub.get(r["subspace"], 0) + r["n_vectors"]
    assert set(by_sub) == set(range(_PQ_M))
    assert all(v == n_vec for v in by_sub.values())


def test_pq_codewords_have_zero_self_distance(spark, sf_dir):
    """The 8 codebook vectors quantize to themselves: for every
    subspace there are >= _PQ_K vectors with sqdist 0 contribution --
    verified indirectly: min avg_sqdist per subspace is below the
    subspace mean (occupied codes exist), and each subspace's smallest
    avg is small because the codeword itself contributes 0."""
    rows = _Q["pq_codebook_stats"](spark, sf_dir).collect()
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r["subspace"], []).append(r["avg_sqdist"])
    for s, dists in by_sub.items():
        assert min(dists) < sum(dists) / len(dists), s


# -- containment pairs + MoM growth -----------------------------------------


def test_containment_bounds_and_jaccard_relation(spark, sf_dir):
    """Jaccard <= min(containment_a, containment_b) <= max <= 1 for
    every candidate pair; the pair stream is exactly the LSH candidate
    set; asymmetric flag mirrors the containment gap."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.dedup import (
        _CONT_ASYM_GAP,
    )

    rows = _Q["shingle_containment_pairs"](spark, sf_dir).collect()
    assert rows
    assert len(rows) == _Q["minhash_lsh_candidates"](spark, sf_dir).count()
    for r in rows:
        ca, cb, j = r["containment_a"], r["containment_b"], r["jaccard"]
        assert 0.0 <= j <= min(ca, cb) + 1e-9
        assert max(ca, cb) <= 1.0 + 1e-9
        assert r["asymmetric"] == (abs(ca - cb) >= _CONT_ASYM_GAP - 1e-9)


def test_mom_growth_is_the_lagged_ratio(spark, sf_dir):
    rows = _Q["revenue_mom_growth"](spark, sf_dir).collect()
    assert len(rows) > 12
    months = [r["order_month"] for r in rows]
    assert months == sorted(months)
    assert rows[0]["mom_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        expect = (cur["revenue"] - prev["revenue"]) / prev["revenue"]
        assert abs(cur["mom_growth"] - expect) < 1e-5


# -- Q11 scalar-threshold share + Q20 aggregate-gated semi-join -------------


def test_important_parts_share_sums_below_one(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q11_FRACTION,
    )

    rows = _Q["important_part_share"](spark, sf_dir).collect()
    assert rows
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    total_share = sum(r["share"] for r in rows)
    assert 0.0 < total_share <= 1.0 + 1e-6
    assert all(r["share"] > _Q11_FRACTION - 1e-9 for r in rows)


def test_heavy_suppliers_actually_cleared_the_gate(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q20_HI,
        _Q20_LO,
        _Q20_MIN_QTY,
        _Q20_NAME_FRAGMENT,
        _Q20_NATION,
    )

    rows = _Q["heavy_red_part_suppliers"](spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{_Q20_NAME_FRAGMENT}%")
    )
    qty = {
        r["l_suppkey"]: r["q"]
        for r in li.filter(
            (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    nation_keys = {
        r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == _Q20_NATION)
        .collect()
    }
    for r in rows:
        assert r["suppkey"] in nation_keys
        assert qty[r["suppkey"]] > _Q20_MIN_QTY
    # completeness: every nation supplier over the gate is reported
    expect = {k for k in nation_keys if qty.get(k, 0) > _Q20_MIN_QTY}
    assert {r["suppkey"] for r in rows} == expect


def test_source_novelty_is_a_partition_share(spark, sf_dir):
    """novelty = exclusive/total per source, in [0,1]; global exclusive
    count equals the number of single-source shingles computed
    directly."""
    rows = _Q["source_ngram_novelty"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_exclusive"] <= r["n_shingles"]
        assert abs(r["novelty"] - r["n_exclusive"] / r["n_shingles"]) < 1e-4
    from apache_iceberg_with_clickhouse_olake_spark.operators.dedup import (
        with_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    per_src = {}
    pairs = (
        docs.select("doc_id", "source")
        .join(with_shingles(docs), "doc_id")
        .select("source", F.explode("shingles").alias("s"))
        .distinct()
        .collect()
    )
    for r in pairs:
        per_src.setdefault(r["s"], set()).add(r["source"])
    exclusive = sum(1 for v in per_src.values() if len(v) == 1)
    assert sum(r["n_exclusive"] for r in rows) == exclusive
