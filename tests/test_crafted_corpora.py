"""Edge-domain pinning on crafted parquet: degenerate inputs the real
fixtures never produce (zero-norm embeddings, exact replica cliques,
antiparallel pairs, fewer vectors than k) must keep every oracle
hash-exact. This is where the zero-norm-cosine contract is enforced:
Spark's raw fold yields NaN while DuckDB's list_cosine_similarity
yields -1.0 -- both sides now define it as NULL (similarity._cos /
_COS_SQL), ranked last under DESC NULLS LAST."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from tests.oracle_utils import assert_match

registry._load_all()

_DIM = 64


def _vec(*head: float) -> list[float]:
    v = [0.0] * _DIM
    for i, x in enumerate(head):
        v[i] = float(x)
    return v


_CRAFTED_EMB = [
    # replica clique: three byte-identical vectors
    (1, _vec(1, 2, 3), 0),
    (2, _vec(1, 2, 3), 0),
    (3, _vec(1, 2, 3), 1),
    # zero-norm vector (failed embedding row)
    (4, _vec(), 1),
    # antiparallel pair: TRUE cosine -1, which must stay distinct from
    # the zero-norm NULL
    (5, _vec(2, 0, 1), 2),
    (6, _vec(-2, 0, -1), 2),
    # a loner
    (7, _vec(0, 5, 0, 1), 3),
]

_EMB_QUERIES = (
    "cosine_topk",
    "embedding_kmeans_profile",
    "semantic_dedup_stats",
    "semantic_dedup_cascade_stats",
    "ann_kmeans_ivf_topk",
    "embedding_near_dup_pairs",
    "embedding_dedup_cascade_stats",
    "embedding_norm_profile",
    "embedding_int8_quantization",
    # r11 additions: the sampled evals and the sign/centroid passes must
    # keep the zero-norm NULL contract (guarded _COS_SQL) and resolve
    # replica/antiparallel ties identically on both engines
    "ann_dim_truncation_recall",
    "embedding_sign_hamming_topk",
    "knn_label_purity",
    "label_centroid_outliers",
    # r15: the two-level family and the filtered/incremental/balanced
    # ops on the degenerate corpus -- 7 vectors < k floor, a zero-norm
    # row inside a probed list, a query whose label slice holds fewer
    # than k candidates (filtered exact_k underfills), and ZERO
    # arrivals for the incremental assign (no vec_id % 8 == 0 here):
    # every branch must stay hash-exact on both engines
    "embedding_kmeans_twolevel_profile",
    "ann_twolevel_ivf_topk",
    "ann_twolevel_recall",
    "semantic_dedup_twolevel_stats",
    "embedding_decontamination_scan",
    "ann_filtered_topk",
    "ann_filtered_recall",
    "ann_filtered_probe_sweep",
    "cluster_balanced_sample_stats",
    "ann_index_incremental_assign",
    "ann_twolevel_filtered_topk",
    # r16: the filtered two-level recall eval on the degenerate corpus
    # (query's label slice holds fewer than k candidates, so exact_k
    # underfills and both engines must agree on the short set)
    "ann_twolevel_filtered_recall",
    # r16: the sweep (widths 3,4 exceed the 2-coarse-cluster index --
    # flat tail rows must agree) and the batch eval (batch LIMIT 8 on
    # a 7-vector corpus returns ALL rows incl. the zero-norm query,
    # whose every cosine is NULL on both engines)
    "ann_twolevel_probe_sweep",
    "ann_twolevel_batch_recall",
)


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crafted") / "sf")
    emb = spark.createDataFrame(
        _CRAFTED_EMB, "vec_id long, embedding array<float>, label int"
    )
    emb.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def crafted_duck(crafted_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_embedding_ops_hash_exact_on_crafted(
    spark, crafted_dir, crafted_duck, name
):
    spec = registry.REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("rows-only op")
    assert_match(spec.fn(spark, crafted_dir), crafted_duck, spec.oracle, name)


def test_zero_vector_never_wins_topk(spark, crafted_dir):
    """The zero vector's cosine is NULL (undefined): it may appear only
    after every defined-cosine candidate, and the antiparallel partner
    keeps its legitimate -1.0."""
    rows = registry.REGISTRY["cosine_topk"].fn(spark, crafted_dir).collect()
    sims = [r["cos_sim"] for r in rows]
    defined = [x for x in sims if x is not None]
    assert defined == sorted(defined, reverse=True)
    if None in sims:
        assert all(x is None for x in sims[sims.index(None):])
    assert -1.0 in defined or min(defined) < 0  # antiparallel visible


def test_replica_clique_collapses_in_cascade(spark, crafted_dir):
    rows = (
        registry.REGISTRY["semantic_dedup_cascade_stats"]
        .fn(spark, crafted_dir)
        .collect()
    )
    assert sum(r["vectors_total"] for r in rows) == len(_CRAFTED_EMB)
    # the 3-replica clique loses exactly 2 rows to exact dedup
    assert sum(r["removed_exact"] for r in rows) == 2


# ---------------------------------------------------------------------------
# Pathological text: empty docs, no-word docs, same-char runs
# ---------------------------------------------------------------------------

_LONG_TEXT = " ".join(f"w{i:02d}" for i in range(100))

_CRAFTED_DOCS = [
    (1, "aaa aaa aaa", "en", "web", 11),        # one word type, (a,a) overlap runs
    (2, "", "en", "web", 0),                     # empty text
    (3, "123 456 !!!", "zz", "junk", 11),        # no [a-z] word at all
    (4, "a", "en", "web", 1),                    # single 1-char word
    (5, "abab abab baba", "de", "web", 14),      # alternating pairs
    # r15: duplicate GROUPS -- the real fixtures contain zero duplicate
    # normalized texts, so soft dedup's 1/n weighting (and any op keyed
    # on exact-dup group size) was never exercised on the branch it
    # exists for. One cross-source group of 3 and one within-source
    # pair:
    (6, "dup dup text", "en", "web", 12),
    (7, "dup dup text", "en", "web", 12),
    (8, "dup dup text", "en", "news", 12),
    (9, "twin pair", "de", "news", 9),
    (10, "twin pair", "de", "news", 9),
    # a 100-token doc: longer than the packing sweep's smallest budget,
    # so concat-and-split bin spanning and truncation loss engage
    (11, _LONG_TEXT, "en", "web", len(_LONG_TEXT)),
]

_DOC_QUERIES = (
    "bpe_pair_frequencies",
    "bpe_learn_merges",
    "bpe_tokenize_corpus_stats",
    "stratified_quota_sample",
    "text_token_stats",
    # the wider text/dedup family over the same pathological corpus
    "text_quality_scores",
    "lang_distribution",
    "language_id_heuristic",
    "doc_fingerprints",
    "dedup_exact_stats",
    "dedup_keep_first",
    "minhash_lsh_candidates",
    "ngram_jaccard_neardups",
    "simhash_fingerprints",
    "doc_repetition_stats",
    "crossdoc_ngram_repetition",
    "repeated_span_examples",
    "top_terms",
    "tfidf_top_terms",
    "token_count_bpe",
    "unigram_logprob_quality",
    "quality_threshold_sweep",
    "uniform_hash_sample",
    "sequence_packing_stats",
    "corpus_mixture_weights",
    "quality_length_pareto",
    # r10 additions: winnowing (empty text -> 1 whole-doc fingerprint;
    # no-word docs -> symbol grams), BM25 (query terms absent -> empty
    # result on both engines), containment over an empty candidate
    # stream, calibration, and the per-lang fertility ratios
    "winnowing_fingerprints",
    "winnowing_neardup_pairs",
    "shingle_containment_pairs",
    "minhash_estimate_calibration",
    "bm25_topk_search",
    "tokenizer_fertility_by_lang",
    # r11: KL over a corpus with empty/no-word docs (sources whose
    # token count is zero simply have no (source, term) rows), and PMI
    # where the min-df gate empties the pair set on both engines
    "source_unigram_kl",
    "term_cooccurrence_pmi",
    # r11 late: CMS over a tiny skewed stream (estimate >= exact even
    # at w >> vocab), per-doc argmax over a near-empty candidate set,
    # and the leakage scan where the 1/10 hash split can select ZERO
    # test docs -- leakage_rate must be NULL via NULLIF on both engines
    "countmin_heavy_hitters",
    "nearest_neardup_doc",
    "train_test_leakage_scan",
    # r13: the split keys off duplicate-cluster ids (empty docs are one
    # exact-dup cluster), the matrix/histogram re-group the same pair
    # stream, and the source-fair cut must survive zero-token sources
    # (NULL scores drop from both engines' percentiles identically)
    "leakage_safe_split_stats",
    "cross_source_dup_matrix",
    "neardup_degree_histogram",
    "quality_source_fair_threshold",
    # r15: the duplicate groups above make the 1/n weighting real; the
    # long doc makes the packing sweep's truncation/bin-spanning
    # branches real; the temperature sweep sees a 3-source corpus
    "soft_dedup_weights_stats",
    "packing_efficiency_sweep",
    "mixture_temperature_sweep",
    # r16: the epoch planner on the zero-token 'junk' source (NULL
    # epochs, zero served, full-target shortfall on both engines)
    "data_constrained_epochs",
    # r16 late: the curriculum pair on the pathological corpus --
    # empty/no-word docs land in bin 0 (excluded from the phase
    # budget), duplicate quartile cut values collapse middle bins,
    # and both engines must agree on the short bin set
    "curriculum_difficulty_bins",
    "curriculum_phase_plan",
    "chunk_dedup_stats",
)


def test_chunk_dedup_counts_on_crafted_duplicates(spark, crafted_docs_dir):
    """Hand-computed chunk-dup accounting: every crafted doc is <= 64
    tokens except the 100-token one (2 chunks, both unique), so the
    dup chunks are exactly the duplicate-GROUP members -- web carries
    the two 'dup dup text' copies, news carries its one copy plus the
    'twin pair' pair; the empty doc contributes no chunk."""
    rows = {
        r["source"]: r
        for r in registry.REGISTRY["chunk_dedup_stats"]
        .fn(spark, crafted_docs_dir)
        .collect()
    }
    web, news, junk = rows["web"], rows["news"], rows["junk"]
    assert web["chunks"] == 7  # docs 1,4,5,6,7 (1 each) + doc 11 (2)
    assert web["dup_chunks"] == 2 and web["docs_with_dup_chunk"] == 2
    assert news["chunks"] == 3
    assert news["dup_chunks"] == 3 and news["docs_with_dup_chunk"] == 3
    assert junk["chunks"] == 1 and junk["dup_chunks"] == 0
    assert junk["chunk_dup_rate"] == 0.0


def test_soft_dedup_weights_on_crafted_duplicates(spark, crafted_docs_dir):
    """Hand-computed 1/n masses on the known duplicate groups: the
    'dup dup text' clique (n=3, split 2 web + 1 news) and the 'twin
    pair' (n=2, news). web = 5 uniques + 2/3; news = 1/3 + 1/2 + 1/2;
    junk = 1 unique. A wrong weighting expression (n*grp instead of
    n/grp, wrong fingerprint key) cannot pass these."""
    rows = {
        r["source"]: r
        for r in registry.REGISTRY["soft_dedup_weights_stats"]
        .fn(spark, crafted_docs_dir)
        .collect()
    }
    web, news, junk = rows["web"], rows["news"], rows["junk"]
    assert web["docs"] == 7 and web["dup_docs"] == 2
    assert abs(web["effective_docs"] - (5 + 2 * 0.333333)) < 1e-9
    assert news["docs"] == 3 and news["dup_docs"] == 3
    assert abs(news["effective_docs"] - (0.333333 + 0.5 + 0.5)) < 1e-9
    assert junk["docs"] == 1 and junk["dup_docs"] == 0
    assert junk["effective_docs"] == 1.0 and junk["char_retention"] == 1.0
    assert 0.0 < web["char_retention"] < 1.0
    assert 0.0 < news["char_retention"] < 1.0


@pytest.fixture(scope="module")
def crafted_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crafted_docs") / "sf")
    docs = spark.createDataFrame(
        _CRAFTED_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def crafted_docs_duck(crafted_docs_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_docs_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_text_ops_hash_exact_on_pathological_docs(
    spark, crafted_docs_dir, crafted_docs_duck, name
):
    spec = registry.REGISTRY[name]
    assert_match(
        spec.fn(spark, crafted_docs_dir), crafted_docs_duck, spec.oracle, name
    )


def test_bpe_merges_handle_same_char_runs(spark, crafted_docs_dir):
    """'aaa' x3 + alternation: the first merge must be a real pair and
    every merge count stays positive (no empty-table wedge from the
    no-word docs)."""
    rows = (
        registry.REGISTRY["bpe_learn_merges"]
        .fn(spark, crafted_docs_dir)
        .orderBy("merge_rank")
        .collect()
    )
    assert rows, "merges must exist on a corpus with words"
    assert all(r["pair_count"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# Degenerate percentile groups: 1-row, all-ties, zero-price
# ---------------------------------------------------------------------------

_CRAFTED_ORDERS = [
    ("X", 100.0),                                  # singleton group
    ("Y", 10.0), ("Y", 20.0),                      # even-count interpolation
    ("Z", 5.0), ("Z", 5.0), ("Z", 5.0),            # all ties
    ("W", 0.0), ("W", 0.0),                        # zero-price group
]


@pytest.fixture(scope="module")
def crafted_orders_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crafted_orders") / "sf")
    orders = spark.createDataFrame(
        _CRAFTED_ORDERS, "o_orderstatus string, o_totalprice double"
    )
    orders.coalesce(1).write.parquet(f"{d}/orders.parquet")
    return d


@pytest.fixture(scope="module")
def crafted_orders_duck(crafted_orders_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{crafted_orders_dir}/orders.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["order_value_percentiles", "order_value_percentiles_approx"]
)
def test_percentiles_hash_exact_on_degenerate_groups(
    spark, crafted_orders_dir, crafted_orders_duck, name
):
    spec = registry.REGISTRY[name]
    assert_match(
        spec.fn(spark, crafted_orders_dir),
        crafted_orders_duck,
        spec.oracle,
        name,
    )


def test_winnowing_guarantee_on_a_shared_run(spark):
    """The winnowing GUARANTEE (Schleimer et al. thm 1): two documents
    sharing a run of >= w + k - 1 consecutive tokens must share at
    least one fingerprint -- regardless of where the run sits in
    either document. Crafted: an 8-token run embedded at different
    offsets inside otherwise-disjoint documents (w=4, k=3 => any
    shared 6-token run is already caught)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.dedup import (
        _WIN_K,
        _WIN_W,
        _winnowed,
    )

    run = [f"shared{i}" for i in range(_WIN_W + _WIN_K + 1)]  # 8 tokens
    doc_a = " ".join([f"alpha{i}" for i in range(7)] + run)
    doc_b = " ".join(
        [f"beta{i}" for i in range(3)]
        + run
        + [f"gamma{i}" for i in range(9)]
    )
    doc_c = " ".join(f"omega{i}" for i in range(15))  # disjoint control
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    fps = {
        r["doc_id"]: set(r["fps"]) for r in _winnowed(docs).collect()
    }
    assert fps[1] & fps[2], "shared run must yield a common fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


# ---------------------------------------------------------------------------
# r11 closed-form pins: KL(p||p) = 0, PMI of a perfect collocation,
# sign-Hamming of replicas/zero vectors
# ---------------------------------------------------------------------------


def test_source_kl_is_exactly_zero_on_identical_sources(
    spark, tmp_path_factory
):
    """Two sources with IDENTICAL token multisets: every per-term ratio
    is p/q = 1, ln(1) = 0, and the snapped sum must be EXACTLY 0.0 in
    both engines -- the Gibbs floor, not approximately."""
    d = str(tmp_path_factory.mktemp("kl_zero") / "sf")
    rows = [
        (1, "alpha beta beta gamma", "en", "srcA", 21),
        (2, "alpha beta beta gamma", "en", "srcB", 21),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = registry.REGISTRY["source_unigram_kl"].fn(spark, d).collect()
    assert [r["source"] for r in out] == ["srcA", "srcB"]
    for r in out:
        assert r["kl_nats"] == 0.0
        assert r["n_tokens"] == 4
        assert r["n_terms"] == 3


def test_pmi_matches_the_closed_form_on_a_perfect_collocation(
    spark, tmp_path_factory
):
    """Terms that ALWAYS co-occur (df_a = df_b = df_ab = d over N docs)
    must score pmi = ln(N/d) exactly (one double division + one ln on
    both engines, then the same dround)."""
    import math

    d = str(tmp_path_factory.mktemp("pmi") / "sf")
    rows = [
        (i, "xx yy filler%d" % i, "en", "web", 20) for i in range(6)
    ] + [(6, "solo other", "en", "web", 10), (7, "solo other", "en", "web", 10)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = registry.REGISTRY["term_cooccurrence_pmi"].fn(spark, d).collect()
    got = {(r["term_a"], r["term_b"]): r for r in out}
    assert ("xx", "yy") in got
    r = got[("xx", "yy")]
    assert r["df_ab"] == 6
    # 0.2876820724... is not a rounding tie, so Python round == HALF_UP
    want = round(math.log((6 / 8.0) / ((6 / 8.0) * (6 / 8.0))), 6)
    assert r["pmi"] == want, (r["pmi"], want)


def test_sign_hamming_sees_replicas_at_zero_and_zero_vec_at_popcount(
    spark, crafted_dir
):
    """Byte-identical replicas of the query are Hamming 0; the all-zero
    vector's signature is 0, so its distance is the query signature's
    popcount (3 positive components); its cosine stays NULL."""
    rows = (
        registry.REGISTRY["embedding_sign_hamming_topk"]
        .fn(spark, crafted_dir)
        .collect()
    )
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[2]["hamming"] == 0 and by_id[3]["hamming"] == 0
    assert by_id[4]["hamming"] == 3  # zero vector vs 3 positive bits
    assert by_id[4]["cos_exact"] is None


# ---------------------------------------------------------------------------
# Malformed / non-strict JSON props: the strict-JSON extraction contract
# ---------------------------------------------------------------------------

# Every leniency divergence the two engines have, pinned value-for-value
# (r11 ADVICE): Spark's get_json_object accepts single quotes where
# DuckDB's json_valid refuses; DuckDB's json_valid accepts trailing
# commas where Jackson refuses; both take the FIRST duplicate key; both
# emit the literal string for numeric-string/padded/NaN values, which
# the integer-regex gate then NULLs identically.
_CRAFTED_PROPS = [
    '{"k": 5}',            # strict, integral
    "{'k': 5}",            # single quotes: Spark-lenient, Duck-invalid
    '{"k": 1, "k": 2}',    # duplicate keys: both resolve to the FIRST
    '{"k": "7"}',          # numeric string: extracted then cast
    '{"k": 1.5}',          # non-integral: integer-regex NULLs it
    "not json",            # garbage
    '{"k": null}',         # explicit null
    "{}",                  # key absent
    '{"k": +3}',           # leading +: invalid number in BOTH parsers
    '{"k": 007}',          # leading zeros: invalid in BOTH parsers
    '{"k":"  8 "}',        # padded numeric string: regex rejects
    None,                  # NULL props column
    '{"k": 5,}',           # trailing comma: Duck-lenient, Spark-invalid
    '{"k": NaN}',          # non-numeric number literal
    "[1, 2]",              # valid JSON, not an object
    '{"k": 9, "s": ",}"}',  # ',}' INSIDE a string: strict, must extract
    '{"k": 4, "s": "a,]"}',  # ',]' inside a string: strict, must extract
]


@pytest.fixture(scope="module")
def crafted_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crafted_events") / "sf")
    rows = [
        (
            i,
            f"2024-01-0{1 + i % 9} 0{i % 10}:15:00",
            100 + i % 4,
            "click" if i % 2 else "view",
            float(i),
            props,
        )
        for i, props in enumerate(_CRAFTED_PROPS)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def crafted_events_duck(crafted_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{crafted_events_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "event_props_json_stats",
        "events_interval_bucket_join",
        "user_lifetime_stats",
    ],
)
def test_events_ops_hash_exact_on_malformed_props(
    spark, crafted_events_dir, crafted_events_duck, name
):
    spec = registry.REGISTRY[name]
    assert_match(
        spec.fn(spark, crafted_events_dir),
        crafted_events_duck,
        spec.oracle,
        name,
    )


def test_json_null_contract_counts_exactly_the_strict_integrals(
    spark, crafted_events_dir
):
    """Of the 17 crafted props, exactly five yield a k on both engines:
    strict {"k": 5}, first-duplicate {"k": 1, ...}, the numeric string
    {"k": "7"}, and the two strict docs whose OTHER string values embed
    ",}"/",]" (the string-aware rejector fix, r12 ADVICE) -- single-
    quoted JSON must NOT leak through Spark's leniency, trailing commas
    must NOT leak through DuckDB's, and ',}'-in-string must NOT trip
    the oracle's trailing-comma scan."""
    rows = (
        registry.REGISTRY["event_props_json_stats"]
        .fn(spark, crafted_events_dir)
        .collect()
    )
    assert sum(r["n_events"] for r in rows) == len(_CRAFTED_PROPS)
    assert sum(r["n_with_k"] for r in rows) == 5
    ks = {v for r in rows for v in (r["min_k"], r["max_k"]) if v is not None}
    assert ks <= {1, 4, 5, 7, 9}


# ---------------------------------------------------------------------------
# Dup-graph structure: a clique of exact replicas vs isolated docs
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clique_docs_dir(spark, tmp_path_factory):
    """4 byte-identical replicas (pairwise Jaccard 1 -- every banding
    scheme finds every pair, so the structure assertions are
    probability-free) + 3 mutually-dissimilar singletons."""
    d = str(tmp_path_factory.mktemp("clique_docs") / "sf")
    rep = "the quick brown fox jumps over the lazy dog " * 6
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta " * 6,
        "one two three four five six seven eight nine ten " * 6,
        "spark catalyst tungsten shuffle broadcast partition " * 6,
    ]
    rows = [(i, rep, "en", "web", len(rep)) for i in range(1, 5)] + [
        (10 + j, t, "en", "books", len(t)) for j, t in enumerate(uniq)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_degree_histogram_pins_clique_structure(spark, clique_docs_dir):
    """On the replica corpus the dup graph is one 4-clique: histogram
    must read exactly {degree 3: 4 docs, degree 0: 3 docs} -- the
    structural claim (component size alone cannot distinguish a star
    from a clique; degree can) made executable without LSH-probability
    flakiness (Jaccard-1 pairs survive any banding)."""
    rows = {
        r["degree"]: r["n_docs"]
        for r in registry.REGISTRY["neardup_degree_histogram"]
        .fn(spark, clique_docs_dir)
        .collect()
    }
    assert rows == {0: 3, 3: 4}


def test_leakage_safe_split_lands_clique_in_one_split(spark, clique_docs_dir):
    """The 4 replicas are one duplicate cluster: exactly 4 clusters
    total (1 clique + 3 singletons), the clique's docs land whole in
    ONE split, and the cluster-keyed straddle is 0."""
    rows = registry.REGISTRY["leakage_safe_split_stats"].fn(
        spark, clique_docs_dir
    ).collect()
    assert sum(r["n_docs"] for r in rows) == 7
    assert sum(r["n_clusters"] for r in rows) == 4
    assert all(r["clusters_straddling"] == 0 for r in rows)
    # the clique contributes 4 docs but only 1 cluster to its split
    assert any(
        r["n_docs"] - r["n_clusters"] == 3 for r in rows
    ), rows
