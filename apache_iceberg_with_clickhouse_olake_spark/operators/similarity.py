"""Similarity search over the ``embeddings`` table (north-star
LLM-pipeline surface; no reference counterpart -- extends the engine to
vector workloads).

Layers, from exact to scale-path:
- ``cosine_topk``: brute-force exact top-k against one query vector. The
  query vector is a 1-row broadcast; the scan is a single pass, no
  shuffle except the final top-k (TakeOrderedAndProject).
- ``embedding_near_dup_pairs``: cosine near-dup candidates via
  multi-band random-hyperplane LSH -- the self-join is keyed on
  (label, band_id, band_val), so bucket granularity is a knob that
  scales with the corpus, never an all-pairs or per-label-linear join.
- ``embedding_dedup_cascade_stats``: exact vector dedup (quantized-
  component fingerprint) collapses replica groups BEFORE the banded
  pairing -- the cascade shape that keeps pair enumeration linear on
  corpora with replicated vectors (measured in SCALING.md).
- ``ann_lsh_bucketed_topk``: random-hyperplane LSH (sign bits -> bucket),
  search only the query's bucket. Hyperplanes are md5-seeded +/-1
  literals shared with the oracle, so even the ANN path is oracle-exact.
- ``ann_ivf_topk``: IVF with per-label mean centroids (posexplode +
  groupBy -- fully distributed), probing the 2 nearest centroids.
  Rows-only: float avg accumulation order differs per engine.

All dot products / norms are left-fold ``F.aggregate`` over
double-cast arrays -- verified bit-identical to DuckDB's
``list_cosine_similarity`` on this data, so cosines can be compared
exactly after dround.

Scale notes: vectors never leave their row (no per-dimension shuffle
except IVF centroid build, which reduces to labels x dims rows);
broadcast is only applied to provably tiny sides (1-row query, 10-row
centroid set).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg, davg_sql, dround, dround_sql
from ..sources.parquet import load_table
from ._cache import finalize as _finalize
from ._cache import persist_tracked as _persist
from ._cache import scoped as _scoped
from .registry import query

_DIM = 64
_N_PLANES = 8
# Near-dup threshold calibrated to the synthetic embeddings (max same-label
# cosine ~0.47; real corpora would use ~0.9+). Constant shared with oracle.
_NEAR_DUP_COS = 0.3
_TOP_K = 10

# Banding for embedding_near_dup_pairs: b bands of r hyperplanes each
# (see _embed_lsh_udf.py). r sets the blocking granularity (2^r buckets
# per band per label) and is the knob that grows with the corpus
# (r ~ log2 n); b restores recall lost to finer bands
# (recall = 1-(1-p^r)^b for per-plane agreement p = 1 - theta/pi).
# 16x8 targets the REALISTIC near-dup operating point cos>=0.9 (p~0.86):
# recall 99.6%, while uncorrelated background (cos~0) collides on some
# band only ~6% of the time -- the candidate stream tracks true near-dup
# density, not the within-bucket pair count. At the synthetic corpus's
# deliberately-hard threshold cos>=0.3 (barely above the background p99
# of 0.295, where NO sign-LSH geometry separates well), measured recall
# is 22% -- the test checks the banding/verify machinery end-to-end, not
# toy-threshold recall.
_ND_BANDS = 16
_ND_PLANES_PER_BAND = 8


def _plane(p: int) -> list[float]:
    """Deterministic +/-1 hyperplane components from md5 -- same literals
    are inlined into the DuckDB oracle, so LSH bucketing is engine-exact."""
    out = []
    for i in range(_DIM):
        h = hashlib.md5(f"hp-{p}-{i}".encode()).digest()[0]
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


_PLANES = [_plane(p) for p in range(max(_N_PLANES, _ND_BANDS * _ND_PLANES_PER_BAND))]


def _dvec(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def _cos(a: Column, b: Column) -> Column:
    """Cosine with zero-norm defined as NULL (undefined), not a value.
    Real corpora contain zero vectors (failed embedding rows); Spark's
    raw fold yields NaN (0/0) for them while DuckDB's
    list_cosine_similarity returns -1.0 -- conflating "undefined" with
    a legitimate antiparallel cosine AND diverging cross-engine. Both
    sides therefore guard the denominator: NULL ranks last under every
    DESC NULLS LAST top-k and fails every >= threshold filter, in both
    engines (pinned by tests/test_crafted_corpora.py)."""
    denom = _norm(a) * _norm(b)
    return _dot(a, b) / F.when(denom == 0, F.lit(None)).otherwise(denom)


def _cos_pre(a: Column, na: Column, b: Column, nb: Column) -> Column:
    """_cos with PRE-COMPUTED norms: bit-identical arithmetic (the
    same sqrt-of-squares doubles, multiplied and guarded the same
    way), but the norms are computed once per VECTOR instead of once
    per PAIR -- in a quadratic pair join that is the difference
    between one 64-dim fold per pair and three. Callers persist the
    norm column alongside dv on the pair join's build frames."""
    denom = na * nb
    return _dot(a, b) / F.when(denom == 0, F.lit(None)).otherwise(denom)


def _plane_sql(p: int) -> str:
    return "[" + ",".join(repr(x) for x in _PLANES[p]) + "]"


def _bucket(vec_col: str = "v") -> Column:
    """LSH bucket id: bit p set iff dot(v, plane_p) >= 0. Built as ONE
    SQL string over the named column (r18): the old per-literal Column
    construction made ~4k py4j round-trips (8 planes x 64 F.lit plus
    the fold), ~0.9 s of DRIVER time per call site -- the same wall the
    PQ stage audit found. The parsed tree is the same shape: the same
    zip_with/aggregate left-to-right fold as _dot, the same
    CASE-per-plane bit sum, +/-1.0 double literals. The column name is
    backtick-quoted in the generated SQL (r19 ADVICE): only a simple
    column reference is valid here, never an expression."""
    col_ref = f"`{vec_col}`"
    parts = []
    for p in range(_N_PLANES):
        arr = ", ".join(
            "1.0D" if x > 0 else "-1.0D" for x in _PLANES[p]
        )
        dot = (
            f"aggregate(zip_with({col_ref}, array({arr}),"
            " (x, y) -> x * y), 0.0D, (acc, w) -> acc + w)"
        )
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return F.expr("(" + " + ".join(parts) + ")")


def _bucket_sql(vec_expr: str) -> str:
    # list_dot_product sums left-to-right like Spark's zip_with/aggregate
    # fold (verified bit-identical on this data) and is ~100x faster than
    # an explicit list_reduce fold.
    parts = []
    for p in range(_N_PLANES):
        dot = (
            f"list_dot_product(CAST({vec_expr} AS DOUBLE[]), {_plane_sql(p)})"
        )
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


# Zero-norm guard mirrors _cos (see its docstring): the squared-norm
# product is exactly 0 iff either vector is all-zero.
_COS_SQL = (
    "(CASE WHEN list_sum(list_transform(CAST({a} AS DOUBLE[]), x -> x*x))"
    " * list_sum(list_transform(CAST({b} AS DOUBLE[]), x -> x*x)) = 0"
    " THEN NULL ELSE"
    " list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " END)"
)


# ---------------------------------------------------------------------------
# Exact brute-force top-k
# ---------------------------------------------------------------------------

@query(
    "cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv
               FROM embeddings ORDER BY vec_id LIMIT 1)
    SELECT e.vec_id, e.label,
           {dround_sql(_COS_SQL.format(a='e.embedding', b='q.qv'), 6)} AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> q.qid
    ORDER BY cos_sim DESC NULLS LAST, e.vec_id
    LIMIT {_TOP_K}
    """,
    tags=("llm-similarity",),
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector (the ANN baseline). The
    query side is one row -> broadcast nested-loop; top-k compiles to
    TakeOrderedAndProject (per-partition heads, no global sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", _dvec(F.col("embedding")).alias("v"))
    q = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            # query norm rides the 1-row broadcast: the scan pays two
            # 64-dim folds per row (dot + norm(v)), not three
            _norm(F.col("v")).alias("qn"),
        )
    )
    return (
        e.join(F.broadcast(q), e.vec_id != q.qid)
        .select(
            "vec_id",
            "label",
            dround(
                _cos_pre(
                    F.col("v"), _norm(F.col("v")),
                    F.col("qv"), F.col("qn"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# Norm profile per label
# ---------------------------------------------------------------------------

@query(
    "embedding_norm_profile",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vectors,
           {davg_sql(
               'sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),'
               ' x -> x*x), (x,y) -> x+y))'
           )} AS avg_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
    tags=("llm-similarity", "A2"),
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm profile (embedding sanity check). Norms are
    per-row folds (identical doubles on both engines); the average is the
    decimal-snapped davg, so the whole row is engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", _norm(_dvec(F.col("embedding"))).alias("nrm"))
        .groupBy("label")
        .agg(F.count("*").alias("n_vectors"), davg("nrm", "avg_norm"))
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Near-dup pairs within label buckets
# ---------------------------------------------------------------------------

def _embed_band_ctes(src: str) -> str:
    """planes/comps/bits/bandvals/bands/cand CTE chain over an arbitrary
    (vec_id, label, embedding) relation -- ``embeddings`` for the direct
    pair op, ``reps`` for the cascade. Re-derives the UDF's banding
    relationally: md5-hex-parity +-1 planes, integer-quantized dots
    (order-free, hence bit-identical to numpy), sign bits packed into
    r-bit band values."""
    return f"""
    planes AS (
      SELECT p.p, i.i,
             CASE WHEN substr(md5(concat('hp-', p.p, '-', i.i)), 2, 1)
                       IN ('0','2','4','6','8','a','c','e')
                  THEN 1 ELSE -1 END AS val
      FROM (SELECT unnest(range({_ND_BANDS * _ND_PLANES_PER_BAND})) AS p) p,
           (SELECT unnest(range({_DIM})) AS i) i
    ),
    comps AS (
      SELECT vec_id,
             i.i,
             CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * {1 << 20} + 0.5)
                  AS BIGINT) AS xq
      FROM {src}, (SELECT unnest(range({_DIM})) AS i) i
    ),
    bits AS (
      SELECT c.vec_id, pl.p, (SUM(c.xq * pl.val) >= 0) AS bit
      FROM comps c JOIN planes pl ON c.i = pl.i
      GROUP BY c.vec_id, pl.p
    ),
    bandvals AS (
      SELECT vec_id, p // {_ND_PLANES_PER_BAND} AS band_id,
             CAST(SUM(CASE WHEN bit
                      THEN (1 << (p % {_ND_PLANES_PER_BAND}))
                      ELSE 0 END) AS INT) AS band_val
      FROM bits GROUP BY vec_id, p // {_ND_PLANES_PER_BAND}
    ),
    bands AS MATERIALIZED (
      SELECT b.vec_id, e.label, e.embedding, b.band_id, b.band_val
      FROM bandvals b JOIN {src} e USING (vec_id)
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b, x.label,
             x.embedding AS ea, y.embedding AS eb
      FROM bands x
      JOIN bands y ON x.label = y.label
                  AND x.band_id = y.band_id
                  AND x.band_val = y.band_val
                  AND x.vec_id < y.vec_id
    )
"""


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH {_embed_band_ctes('embeddings')}
    SELECT vec_a, vec_b, label,
           {dround_sql(_COS_SQL.format(a='ea', b='eb'), 4)} AS cos_sim
    FROM cand
    WHERE {_COS_SQL.format(a='ea', b='eb')} >= {_NEAR_DUP_COS}
    """,
    tags=("llm-similarity", "llm-dedup"),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs via multi-band
    random-hyperplane LSH, verified with the exact cosine.

    The self-join is keyed on ``(label, band_id, band_val)``: within each
    label, vectors meet only when one of the _ND_BANDS r-bit sign-bit
    bands collides, so per-bucket population is ``n_label / 2^r`` in
    expectation and the blocking granularity is a config knob that grows
    with the corpus (raise r ~ log2 n, add bands to hold recall) -- unlike
    keying on the label alone, whose fixed cardinality made each bucket
    grow linearly with the corpus and the within-bucket pair loop
    quadratic. A pair sharing k bands is emitted exactly once via the
    first-matching-band filter (map-side, no distinct shuffle -- same
    discipline as simhash/minhash candidate joins, dedup.py). The DuckDB
    oracle rebuilds the identical banding from the shared md5-seeded
    hyperplane literals, so the LSH path is value-checked end-to-end;
    its DISTINCT is the oracle-side stand-in for first-matching-band.

    Band signatures come from one vectorized Arrow UDF over
    integer-quantized dot products (_embed_lsh_udf.py) -- numpy matmul
    for the 128 hyperplane projections instead of 128 interpreted
    higher-order-function folds, and bit-identical to the oracle's
    relational re-derivation because integer sums are order-free."""
    from ._embed_lsh_udf import make_embed_bands_udf

    bands_udf = make_embed_bands_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
        bands_udf(F.col("embedding")).alias("bands"),
    )
    return (
        _embed_candidate_pairs(e)
        .filter(F.col("near_dup"))
        .drop("near_dup", "cos_raw")
    )


def _embed_candidate_pairs(e: DataFrame, n_bands: int = _ND_BANDS) -> DataFrame:
    """Band-keyed candidate self-join + exact-cosine annotation over an
    arbitrary (vec_id, label, v, bands) frame: every band-colliding pair
    exactly once, with its cosine and the near_dup verdict (callers
    filter or aggregate). Body shared by embedding_near_dup_pairs and
    embedding_dedup_cascade_stats.

    Shuffle discipline (same as _minhash_verified_pairs): the exploded
    band rows carry ONLY (vec_id, label, bands, band key) -- the 64-dim
    vector does NOT ride the 16-way band explosion through the self-join
    shuffle (that would amplify shuffled bytes ~16x over the corpus
    vector data). Vectors join back by vec_id AFTER pair formation, so
    the heavy payload moves once per surviving pair side, not once per
    band row."""
    # Norms ride the vector frame: computed once per vector row (the
    # projection sits BELOW the pair join in the plan), so each pair
    # pays one dot fold plus a scalar multiply instead of three 64-dim
    # folds. The guard is the same denom==0 -> NULL as _cos -- the r9
    # idle A/B measured the guard itself as free, this is the FLOP cut.
    vecs = e.select(
        "vec_id", F.col("v").alias("vv"), _norm(F.col("v")).alias("vn")
    )
    par = e.sparkSession.sparkContext.defaultParallelism
    # Explicit repartition on the join keys (same discipline as
    # _minhash_verified_pairs): the pair stage amplifies COMPUTE
    # quadratically per bucket while its shuffle BYTES stay small, and
    # AQE coalesces by bytes -- left alone it shrinks this stage to a
    # handful of tasks and one hot-bucket partition becomes the
    # straggler (zipf skew suite measured 1.7x max/median before, ~1.2x
    # after). An explicit numPartitions is exempt from AQE coalescing,
    # keeping the granularity at cluster parallelism.
    bands = e.select(
        "vec_id",
        "label",
        "bands",
        F.posexplode("bands").alias("band_id", "band_val"),
    ).repartition(par, "label", "band_id", "band_val")
    x, y = bands.alias("x"), bands.alias("y")
    joined = x.join(
        y,
        (F.col("x.label") == F.col("y.label"))
        & (F.col("x.band_id") == F.col("y.band_id"))
        & (F.col("x.band_val") == F.col("y.band_val"))
        & (F.col("x.vec_id") < F.col("y.vec_id")),
    )
    # Exactly-once per pair without a distinct(): keep the row only when
    # no EARLIER band also matched (both full band arrays ride along, so
    # the check is a map-side expression over b' < band_id).
    earlier_match = F.lit(False)
    for b in range(n_bands - 1):
        earlier_match = earlier_match | (
            (F.col("x.band_id") > b)
            & (F.col("x.bands").getItem(b) == F.col("y.bands").getItem(b))
        )
    pairs = joined.filter(~earlier_match).select(
        F.col("x.vec_id").alias("vec_a"),
        F.col("y.vec_id").alias("vec_b"),
        F.col("x.label").alias("label"),
    )
    va, vb = vecs.alias("va"), vecs.alias("vb")
    denom = F.col("va.vn") * F.col("vb.vn")
    cos = _dot(F.col("va.vv"), F.col("vb.vv")) / F.when(
        denom == 0, F.lit(None)
    ).otherwise(denom)
    return (
        pairs.join(va, pairs.vec_a == F.col("va.vec_id"))
        .join(vb, pairs.vec_b == F.col("vb.vec_id"))
        .select(
            "vec_a",
            "vec_b",
            "label",
            dround(cos, 4).alias("cos_sim"),
            # cos_raw rides along so threshold callers (the _with_config
            # path) can filter the UNROUNDED cosine -- filtering the 4-dp
            # display column would shift the boundary by up to 5e-5 vs
            # the registered op's near_dup flag (r6 ADVICE).
            cos.alias("cos_raw"),
            (cos >= _NEAR_DUP_COS).alias("near_dup"),
        )
    )


# Deterministic embedding-probe split for the semantic decontamination
# scan: every 16th vec_id serves as the held-out "eval" probe set (the
# sandbox stand-in for an external eval-embedding table; production
# swaps in a real probe table, same plan shape).
_EPROBE_MOD = 16


@query(
    "embedding_decontamination_scan",
    oracle=f"""
    WITH {_embed_band_ctes('embeddings')},
    candp AS (
      SELECT DISTINCT x.vec_id AS cvec, y.vec_id AS pvec, x.label,
             x.embedding AS ea, y.embedding AS eb
      FROM bands x JOIN bands y
        ON x.label = y.label AND x.band_id = y.band_id
       AND x.band_val = y.band_val
       AND x.vec_id % {_EPROBE_MOD} <> 0
       AND y.vec_id % {_EPROBE_MOD} = 0
    ),
    ver AS (
      SELECT DISTINCT cvec, label FROM candp
      WHERE {_COS_SQL.format(a='ea', b='eb')} >= {_NEAR_DUP_COS}
    ),
    base AS (
      SELECT label,
             COUNT(CASE WHEN vec_id % {_EPROBE_MOD} <> 0 THEN 1 END)
               AS n_corpus,
             COUNT(CASE WHEN vec_id % {_EPROBE_MOD} = 0 THEN 1 END)
               AS n_probes
      FROM embeddings GROUP BY label
    ),
    cc AS (
      SELECT label, COUNT(*) AS candidate_pairs FROM candp GROUP BY label
    ),
    ct AS (
      SELECT label, COUNT(*) AS contaminated FROM ver GROUP BY label
    )
    SELECT b.label,
           CAST(b.n_corpus AS BIGINT) AS n_corpus,
           CAST(b.n_probes AS BIGINT) AS n_probes,
           CAST(COALESCE(cc.candidate_pairs, 0) AS BIGINT)
             AS candidate_pairs,
           CAST(COALESCE(ct.contaminated, 0) AS BIGINT) AS contaminated,
           {dround_sql(
               'COALESCE(ct.contaminated, 0)'
               ' / CAST(NULLIF(b.n_corpus, 0) AS DOUBLE)', 4
           )} AS contamination_rate
    FROM base b
    LEFT JOIN cc USING (label)
    LEFT JOIN ct USING (label)
    ORDER BY b.label
    """,
    tags=("llm-similarity", "llm-dedup"),
)
@_scoped
def embedding_decontamination_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEMANTIC decontamination -- the embedding-space twin of the
    shingle-based decontamination_scan (curation.py): flag every
    training vector whose cosine to ANY eval-probe vector clears the
    near-dup threshold, so paraphrased or re-embedded eval content
    that shares no n-gram still gets caught. Probes are the
    deterministic 1/{mod} vec_id split (an external eval-embedding
    table is a one-line swap -- the plan shape is identical). Emits
    the per-label audit a pipeline alerts on: corpus/probe sizes, LSH
    candidate pairs, contaminated-vector count (distinct corpus
    vectors with >= 1 verified probe hit), contamination rate.

    Shape at scale: rides the SAME multi-band hyperplane-LSH blocking
    as embedding_near_dup_pairs, made asymmetric (corpus side x probe
    side) -- never corpus x probes brute force. Band rows carry only
    ids + band keys (vectors join back per surviving pair); the
    probe side is 1/{mod} of the corpus and shrinks further to its
    band rows; exactly-once per pair via the first-matching-band
    filter (map-side, no distinct shuffle); the contaminated count is
    a distinct over the bounded verified-pair stream. The oracle
    re-derives the identical banding relationally, so the asymmetric
    LSH path is value-checked end-to-end."""
    from ._embed_lsh_udf import make_embed_bands_udf

    bands_udf = make_embed_bands_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    is_probe = (F.col("vec_id") % _EPROBE_MOD) == 0
    par = spark.sparkContext.defaultParallelism
    # Persisted (r14 ADVICE): `e` evaluates the Arrow LSH UDF per row
    # and feeds FOUR consumers (band_rows, both vector-join sides, the
    # per-label base counts) -- without the cache the corpus scan and
    # UDF re-execute per consumer (the semantic_dedup_stats lesson).
    # Repartition-born partitioning per the raw-scan persist rule.
    e = _persist(
        emb.select(
            "vec_id",
            "label",
            _dvec(F.col("embedding")).alias("v"),
            bands_udf(F.col("embedding")).alias("bands"),
            is_probe.alias("is_probe"),
        ).repartition(par, "vec_id")
    )
    band_rows = e.select(
        "vec_id",
        "label",
        "bands",
        "is_probe",
        F.posexplode("bands").alias("band_id", "band_val"),
    ).repartition(par, "label", "band_id", "band_val")
    x = band_rows.filter(~F.col("is_probe")).alias("x")
    y = band_rows.filter(F.col("is_probe")).alias("y")
    joined = x.join(
        y,
        (F.col("x.label") == F.col("y.label"))
        & (F.col("x.band_id") == F.col("y.band_id"))
        & (F.col("x.band_val") == F.col("y.band_val")),
    )
    earlier_match = F.lit(False)
    for b in range(_ND_BANDS - 1):
        earlier_match = earlier_match | (
            (F.col("x.band_id") > b)
            & (F.col("x.bands").getItem(b) == F.col("y.bands").getItem(b))
        )
    pairs = joined.filter(~earlier_match).select(
        F.col("x.vec_id").alias("cvec"),
        F.col("y.vec_id").alias("pvec"),
        F.col("x.label").alias("label"),
    )
    # norms ride the payload frame (the _embed_candidate_pairs
    # discipline): one fold per vector, one dot fold per pair
    vecs = e.select(
        "vec_id", F.col("v").alias("vv"), _norm(F.col("v")).alias("vn")
    )
    va, vb = vecs.alias("va"), vecs.alias("vb")
    scored = (
        pairs.join(va, pairs.cvec == F.col("va.vec_id"))
        .join(vb, pairs.pvec == F.col("vb.vec_id"))
        .select(
            "cvec",
            "label",
            _cos_pre(
                F.col("va.vv"), F.col("va.vn"),
                F.col("vb.vv"), F.col("vb.vn"),
            ).alias("cos_raw"),
        )
    )
    cc = pairs.groupBy("label").agg(F.count("*").alias("candidate_pairs"))
    ct = (
        scored.filter(F.col("cos_raw") >= _NEAR_DUP_COS)
        .select("label", "cvec")
        .distinct()
        .groupBy("label")
        .agg(F.count("*").alias("contaminated"))
    )
    base = e.groupBy("label").agg(
        F.count(F.when(~F.col("is_probe"), 1)).alias("n_corpus"),
        F.count(F.when(F.col("is_probe"), 1)).alias("n_probes"),
    )
    denom = (
        F.when(F.col("n_corpus") == 0, F.lit(None))
        .otherwise(F.col("n_corpus"))
        .cast("double")
    )
    out = (
        base.join(cc, "label", "left")
        .join(ct, "label", "left")
        .select(
            "label",
            "n_corpus",
            "n_probes",
            F.coalesce("candidate_pairs", F.lit(0))
            .cast("long")
            .alias("candidate_pairs"),
            F.coalesce("contaminated", F.lit(0))
            .cast("long")
            .alias("contaminated"),
            dround(
                F.coalesce("contaminated", F.lit(0)) / denom, 4
            ).alias("contamination_rate"),
        )
        .orderBy("label")
    )
    return _finalize(spark, out)


embedding_decontamination_scan.__doc__ = (
    embedding_decontamination_scan.__doc__.replace("{mod}", str(_EPROBE_MOD))
)


def _vec_fp() -> Column:
    """Duplicate fingerprint for vectors: md5 of the comma-joined
    quantized components (same floor(x*2^20+0.5) quantization as the LSH
    dots). Byte-identical embeddings always share a fingerprint; so do
    vectors whose every component falls in the same 2^-20 quantization
    cell -- i.e. "exact dedup" here means equal-to-within-quantization,
    which is the practically useful contract for float embeddings (true
    bitwise equality modulo sub-1e-6 noise) and is what both engines
    can derive identically from integer strings (no float formatting).
    Built lazily: Column construction needs an active SparkContext,
    which module import must not assume."""
    return F.md5(
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(1 << 20)) + F.lit(0.5)
                ).cast("string"),
            ),
            ",",
        )
    )

_VEC_FP_SQL = (
    "md5(array_to_string(list_transform(CAST(embedding AS DOUBLE[]), "
    f"x -> CAST(CAST(floor(x * {1 << 20} + 0.5) AS BIGINT) AS VARCHAR)), "
    "','))"
)


@query(
    "embedding_dedup_cascade_stats",
    oracle=f"""
    WITH reps AS MATERIALIZED (
      SELECT vec_id, label, embedding FROM embeddings
      QUALIFY row_number() OVER (
        PARTITION BY {_VEC_FP_SQL} ORDER BY vec_id) = 1
    ),
    {_embed_band_ctes('reps')},
    verified AS (
      SELECT {_COS_SQL.format(a='ea', b='eb')} >= {_NEAR_DUP_COS} AS near_dup
      FROM cand
    )
    SELECT (SELECT COUNT(*) FROM embeddings) AS total_vectors,
           (SELECT COUNT(*) FROM reps) AS representatives,
           (SELECT COUNT(*) FROM embeddings)
             - (SELECT COUNT(*) FROM reps) AS exact_dup_rows,
           COUNT(*) AS candidate_pairs,
           CAST(COALESCE(SUM(CASE WHEN near_dup THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS near_dup_pairs
    FROM verified
    """,
    tags=("llm-similarity", "llm-dedup"),
)
def embedding_dedup_cascade_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vector dedup cascade (the embedding twin of dedup_cascade_stats):
    collapse byte-identical embeddings to their lowest-vec_id
    representative (row_number over the quantized-component fingerprint,
    one uniform-key shuffle), then run the banded LSH near-dup pairing
    over REPRESENTATIVES ONLY. On a corpus with replicated vectors the
    direct pair op's output grows quadratically in the replication
    factor (every replica pair shares every band); the cascade's pair
    stage sees each replica group once, so its cost tracks distinct
    vectors -- the same mitigation SCALING.md measures for documents."""
    from pyspark.sql import Window

    from ._embed_lsh_udf import make_embed_bands_udf

    bands_udf = make_embed_bands_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("fp").orderBy("vec_id")
    reps = (
        emb.select("vec_id", "label", "embedding", _vec_fp().alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            _dvec(F.col("embedding")).alias("v"),
            bands_udf(F.col("embedding")).alias("bands"),
        )
    )
    # Materialize representatives once: the band explosion, the
    # vector-joinback side, and the count all consume reps, and without
    # a cut each branch re-runs the fingerprint window shuffle AND the
    # band UDF over the corpus. Cluster equivalent: persist/checkpoint
    # (the dedup_cluster_sizes superstep discipline).
    reps = reps.localCheckpoint(eager=True)
    candidates = _embed_candidate_pairs(reps)
    total = emb.agg(F.count("*").alias("total_vectors"))
    repc = reps.agg(F.count("*").alias("representatives"))
    pair_agg = candidates.agg(
        F.count("*").alias("candidate_pairs"),
        F.coalesce(
            F.sum(F.col("near_dup").cast("long")), F.lit(0).cast("long")
        ).alias("near_dup_pairs"),
    )
    return (
        total.crossJoin(repc)
        .crossJoin(pair_agg)
        .select(
            "total_vectors",
            "representatives",
            (F.col("total_vectors") - F.col("representatives")).alias(
                "exact_dup_rows"
            ),
            "candidate_pairs",
            "near_dup_pairs",
        )
    )


# ---------------------------------------------------------------------------
# Near-dup banding recall vs exhaustive ground truth (sampled)
# ---------------------------------------------------------------------------

_RECALL_SAMPLE_LABELS = 3  # labels 0..2: exhaustive truth stays O(sample^2)

# Injected-twin perturbations: alternating-sign component scaling
# x -> x * (1 + eps * s_i), s_i = +1 on even 0-based components. With
# eps=0.05 the twin sits at cos ~0.999 (the real near-dup operating
# point); eps=0.9 lands ~0.74. The synthetic corpus tops out below
# cos 0.5, so without injection the high-sim bins the banding is
# DESIGNED for would be empty and their recall unmeasured.
_RECALL_TWIN_EPS = (0.05, 0.9)
_RECALL_TWIN_OFFSET = 1_000_000


def _perturb_sql(eps: float) -> str:
    # DuckDB lambda index is 1-based; (i-1) matches Spark's 0-based i.
    return (
        "list_transform(CAST(embedding AS DOUBLE[]), (x, i) -> "
        f"x * (1.0 + {eps!r} * CASE WHEN (i - 1) % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END))"
    )


@query(
    "embedding_neardup_recall_eval",
    oracle=f"""
    WITH sample AS MATERIALIZED (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS embedding
      FROM embeddings WHERE label < {_RECALL_SAMPLE_LABELS}
      {''.join(
          f'''UNION ALL
      SELECT vec_id + {(j + 1) * _RECALL_TWIN_OFFSET}, label,
             {_perturb_sql(eps)}
      FROM embeddings WHERE label < {_RECALL_SAMPLE_LABELS}
      '''
          for j, eps in enumerate(_RECALL_TWIN_EPS)
      )}
    ),
    {_embed_band_ctes('sample')},
    coll AS (SELECT vec_a, vec_b FROM cand),
    truth AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
             {_COS_SQL.format(a='x.embedding', b='y.embedding')} AS cs
      FROM sample x JOIN sample y
        ON x.label = y.label AND x.vec_id < y.vec_id
      WHERE {_COS_SQL.format(a='x.embedding', b='y.embedding')}
            >= {_NEAR_DUP_COS}
    )
    SELECT CASE WHEN t.cs >= 0.8 THEN '[0.8,1.0]'
                WHEN t.cs >= 0.5 THEN '[0.5,0.8)'
                ELSE '[{_NEAR_DUP_COS},0.5)' END AS cos_bin,
           COUNT(*) AS truth_pairs,
           CAST(COUNT(c.vec_a) AS BIGINT) AS detected_pairs,
           {dround_sql('CAST(COUNT(c.vec_a) AS DOUBLE) / COUNT(*)', 4)}
             AS recall
    FROM truth t
    LEFT JOIN coll c ON t.vec_a = c.vec_a AND t.vec_b = c.vec_b
    GROUP BY cos_bin
    ORDER BY cos_bin
    """,
    tags=("llm-similarity", "llm-dedup"),
)
def embedding_neardup_recall_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Measured LSH-banding recall against exhaustive GROUND TRUTH, per
    similarity bin — the eval that keeps embedding_near_dup_pairs
    honest. Its oracle re-derives the same banding, so that gate proves
    cross-engine parity but cannot see recall loss; this op computes the
    exhaustive same-label pair set on a label sample (labels 0..2 —
    ground truth is O(sample²) by construction, so it runs on a slice,
    the way a production pipeline audits its ANN index) and reports,
    per cosine bin, how many true pairs the 16x8 banding actually
    catches. The synthetic corpus tops out below cos 0.5, so the sample
    is augmented with deterministic perturbed twins of every vector
    (alternating-sign component scaling, eps 0.05 and 0.9 — identical
    double arithmetic on both engines) to populate the high-similarity
    bins the banding is designed for. Expected shape (and why the
    banding is configured this way): recall climbs steeply with
    similarity — the [0.8,1.0] bin, the REAL near-dup operating point,
    sits near 1.0, while the [0.3,0.5) bin documents the deliberate
    miss rate at the synthetic corpus's barely-above-background
    threshold (similarity.py:56-66). A banding/UDF regression now moves
    a measured number instead of silently shrinking the pair list;
    tests/test_scale_techniques.py pins the floors.

    Detection is positional band-array equality (zip_with + exists) on
    the UDF's signatures — no join through the banded pair op, so the
    eval is independent of the candidate join's dedup discipline; the
    oracle detects via its re-derived band-collision pair set, which is
    the same predicate."""
    from ._embed_lsh_udf import make_embed_bands_udf

    bands_udf = make_embed_bands_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("label") < _RECALL_SAMPLE_LABELS).select(
        "vec_id", "label", _dvec(F.col("embedding")).alias("v")
    )
    def _perturb(eps):
        def fn(x, i):
            sign = F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
            return x * (F.lit(1.0) + F.lit(eps) * sign)

        return fn

    parts = [base]
    for j, eps in enumerate(_RECALL_TWIN_EPS):
        parts.append(
            base.select(
                (F.col("vec_id") + (j + 1) * _RECALL_TWIN_OFFSET).alias(
                    "vec_id"
                ),
                "label",
                F.transform("v", _perturb(eps)).alias("v"),
            )
        )
    aug = parts[0]
    for p in parts[1:]:
        aug = aug.unionByName(p)
    sample = aug.select(
        "vec_id", "label", "v", bands_udf(F.col("v")).alias("bands"),
        _norm(F.col("v")).alias("nrm"),
    )
    x, y = sample.alias("x"), sample.alias("y")
    cs = _cos_pre(
        F.col("x.v"), F.col("x.nrm"), F.col("y.v"), F.col("y.nrm")
    )
    detected = F.exists(
        F.zip_with(
            F.col("x.bands"), F.col("y.bands"), lambda a, b: a == b
        ),
        lambda hit: hit,
    )
    truth = (
        x.join(
            y,
            (F.col("x.label") == F.col("y.label"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(cs.alias("cs"), detected.alias("detected"))
        .filter(F.col("cs") >= _NEAR_DUP_COS)
    )
    cos_bin = (
        F.when(F.col("cs") >= 0.8, F.lit("[0.8,1.0]"))
        .when(F.col("cs") >= 0.5, F.lit("[0.5,0.8)"))
        .otherwise(F.lit(f"[{_NEAR_DUP_COS},0.5)"))
    )
    return (
        truth.groupBy(cos_bin.alias("cos_bin"))
        .agg(
            F.count("*").alias("truth_pairs"),
            F.sum(F.col("detected").cast("long")).alias("detected_pairs"),
        )
        .withColumn(
            "recall",
            dround(
                F.col("detected_pairs").cast("double")
                / F.col("truth_pairs"),
                4,
            ),
        )
        .orderBy("cos_bin")
    )


def embedding_near_dup_pairs_with_config(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int = _ND_BANDS,
    planes_per_band: int = _ND_PLANES_PER_BAND,
    min_cos: float = _NEAR_DUP_COS,
) -> DataFrame:
    """The production near-dup pair op at a USER-CHOSEN banding config:
    run embedding_neardup_config_sweep, pick the (bands, bits) point
    with the recall/cost trade-off your threshold needs (e.g. b64r08
    for measured >= 0.9 recall at cos 0.5), and run it here — same
    plane family, same first-matching-band exactly-once emission, same
    pinned shuffle discipline as the registered 16x8 query. Not
    oracle-registered (the 16x8 default is); pinned instead by the
    containment test in tests/test_scale_techniques.py — a config whose
    per-band bits divide the default's 8 collides on a superset of the
    default's pairs."""
    from ._embed_lsh_udf import make_embed_bands_udf

    bands_udf = make_embed_bands_udf(n_bands, planes_per_band)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
        bands_udf(F.col("embedding")).alias("bands"),
    )
    # Filter the UNROUNDED cosine (cos_raw): at min_cos == _NEAR_DUP_COS
    # this is exactly the registered op's near_dup predicate, so the
    # "explicit default config == registered op" invariant holds at the
    # boundary too, not just on fixtures that avoid it (r6 ADVICE).
    return (
        _embed_candidate_pairs(e, n_bands=n_bands)
        .filter(F.col("cos_raw") >= min_cos)
        .drop("near_dup", "cos_raw")
    )


# ---------------------------------------------------------------------------
# Banding config sweep: recall/cost curve over (bands, planes_per_band)
# ---------------------------------------------------------------------------

# Third twin at eps=1.6 -> cos ~ 1/sqrt(1+eps^2) ~ 0.53: populates the
# [0.5,0.8) MID band the sweep exists to measure (the recall eval's two
# eps values land at ~0.999 and ~0.74).
_SWEEP_TWIN_EPS = (0.05, 0.9, 1.6)


def _sweep_cfg_name(b: int, r: int) -> str:
    return f"b{b:02d}r{r:02d}"


def _sweep_oracle() -> str:
    from ._embed_lsh_udf import MAX_SWEEP_PLANES, SWEEP_CONFIGS

    twin_union = "".join(
        f"""UNION ALL
      SELECT vec_id + {(j + 1) * _RECALL_TWIN_OFFSET}, label,
             {_perturb_sql(eps)}
      FROM embeddings WHERE label < {_RECALL_SAMPLE_LABELS}
      """
        for j, eps in enumerate(_SWEEP_TWIN_EPS)
    )
    bv = ",\n".join(
        f"""
    bv_{i} AS MATERIALIZED (
      SELECT vec_id, p // {r} AS band_id,
             CAST(SUM(CASE WHEN bit THEN (1 << (p % {r})) ELSE 0 END)
                  AS INT) AS band_val
      FROM bits WHERE p < {b * r}
      GROUP BY vec_id, p // {r}
    ),
    coll_{i} AS MATERIALIZED (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM bv_{i} x JOIN bv_{i} y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
       AND x.vec_id < y.vec_id
    )"""
        for i, (b, r) in enumerate(SWEEP_CONFIGS)
    )
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT '{_sweep_cfg_name(b, r)}' AS config, t.cos_bin,
           COUNT(*) AS pairs,
           CAST(COUNT(c.a) AS BIGINT) AS collided_pairs,
           {dround_sql('CAST(COUNT(c.a) AS DOUBLE) / COUNT(*)', 4)}
             AS collision_rate
    FROM binned t LEFT JOIN coll_{i} c ON t.a = c.a AND t.b = c.b
    GROUP BY t.cos_bin"""
        for i, (b, r) in enumerate(SWEEP_CONFIGS)
    )
    return f"""
    WITH sample AS MATERIALIZED (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS embedding
      FROM embeddings WHERE label < {_RECALL_SAMPLE_LABELS}
      {twin_union}
    ),
    planes AS (
      SELECT p.p, i.i,
             CASE WHEN substr(md5(concat('hp-', p.p, '-', i.i)), 2, 1)
                       IN ('0','2','4','6','8','a','c','e')
                  THEN 1 ELSE -1 END AS val
      FROM (SELECT unnest(range({MAX_SWEEP_PLANES})) AS p) p,
           (SELECT unnest(range({_DIM})) AS i) i
    ),
    comps AS (
      SELECT vec_id, i.i,
             CAST(floor(embedding[i.i + 1] * {1 << 20} + 0.5)
                  AS BIGINT) AS xq
      FROM sample, (SELECT unnest(range({_DIM})) AS i) i
    ),
    bits AS MATERIALIZED (
      SELECT c.vec_id, pl.p, (SUM(c.xq * pl.val) >= 0) AS bit
      FROM comps c JOIN planes pl ON c.i = pl.i
      GROUP BY c.vec_id, pl.p
    ),
    {bv},
    binned AS MATERIALIZED (
      SELECT x.vec_id AS a, y.vec_id AS b,
             CASE WHEN {_COS_SQL.format(a='x.embedding', b='y.embedding')}
                       >= 0.8 THEN '[0.8,1.0]'
                  WHEN {_COS_SQL.format(a='x.embedding', b='y.embedding')}
                       >= 0.5 THEN '[0.5,0.8)'
                  WHEN {_COS_SQL.format(a='x.embedding', b='y.embedding')}
                       >= {_NEAR_DUP_COS} THEN '[{_NEAR_DUP_COS},0.5)'
                  ELSE '<{_NEAR_DUP_COS}' END AS cos_bin
      FROM sample x JOIN sample y
        ON x.label = y.label AND x.vec_id < y.vec_id
    )
{selects}
    ORDER BY config, cos_bin
    """


@query(
    "embedding_neardup_config_sweep",
    oracle=_sweep_oracle(),
    tags=("llm-similarity", "llm-dedup"),
)
def embedding_neardup_config_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall/cost curve over banding configs (r5 verdict item 6): the
    recall eval shows the production 16x8 banding deliberately misses
    below cos ~0.5; this sweep measures, against the same exhaustive
    ground truth, what each (bands, planes_per_band) config would catch
    -- so a user targeting a 0.5 threshold picks a config with MEASURED
    >= 0.9 recall instead of inheriting the 0.8-tuned default.

    Curve theory (collision prob = 1-(1-p^r)^b, p = 1 - theta/pi):
    with the hash budget FIXED at 128 bits, coarser bands (b32r04,
    b64r02) buy mid-band recall by exploding the background collision
    rate -- the '<0.3' bin IS the cost axis (b64r02 collides on nearly
    every pair: bucket-join cost degenerates toward all-pairs). Holding
    r=8 and EXTENDING the budget (b32r08, b64r08 = 256/512 bits)
    buys the same recall at a fraction of the background rate; b64r08
    is the measured >= 0.9-at-cos-0.5 recommendation. One pandas UDF
    computes all 512 sign bits per vector (one integer matmul); each
    config is a prefix re-grouping of that bit vector, sliced
    column-side -- the sweep costs one UDF pass regardless of config
    count. Ground truth is the exhaustive same-label pair set on the
    label sample plus deterministic perturbed twins (eps 0.05/0.9/1.6
    -> cos ~0.999/0.74/0.53, populating every bin); identical double
    arithmetic in the DuckDB oracle re-derives every bit and every
    cosine, so the whole curve is engine-exact."""
    from ._embed_lsh_udf import (
        SWEEP_CONFIGS,
        SWEEP_OFFSETS,
        make_embed_sweep_udf,
    )

    sweep_udf = make_embed_sweep_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("label") < _RECALL_SAMPLE_LABELS).select(
        "vec_id", "label", _dvec(F.col("embedding")).alias("v")
    )

    def _perturb(eps):
        def fn(x, i):
            sign = F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
            return x * (F.lit(1.0) + F.lit(eps) * sign)

        return fn

    parts = [base]
    for j, eps in enumerate(_SWEEP_TWIN_EPS):
        parts.append(
            base.select(
                (F.col("vec_id") + (j + 1) * _RECALL_TWIN_OFFSET).alias(
                    "vec_id"
                ),
                "label",
                F.transform("v", _perturb(eps)).alias("v"),
            )
        )
    aug = parts[0]
    for p in parts[1:]:
        aug = aug.unionByName(p)
    sample = aug.select(
        "vec_id", "label", "v", sweep_udf(F.col("v")).alias("sw"),
        _norm(F.col("v")).alias("nrm"),
    )
    x, y = sample.alias("x"), sample.alias("y")
    cs = _cos_pre(
        F.col("x.v"), F.col("x.nrm"), F.col("y.v"), F.col("y.nrm")
    )
    cos_bin = (
        F.when(cs >= 0.8, F.lit("[0.8,1.0]"))
        .when(cs >= 0.5, F.lit("[0.5,0.8)"))
        .when(cs >= _NEAR_DUP_COS, F.lit(f"[{_NEAR_DUP_COS},0.5)"))
        .otherwise(F.lit(f"<{_NEAR_DUP_COS}"))
    )
    hits = []
    for i, (b, r) in enumerate(SWEEP_CONFIGS):
        off = SWEEP_OFFSETS[i]
        hit = F.exists(
            F.zip_with(
                F.slice(F.col("x.sw"), off + 1, b),
                F.slice(F.col("y.sw"), off + 1, b),
                lambda a, c: a == c,
            ),
            lambda h: h,
        )
        hits.append(
            F.struct(
                F.lit(_sweep_cfg_name(b, r)).alias("config"),
                hit.alias("hit"),
            )
        )
    pairs = x.join(
        y,
        (F.col("x.label") == F.col("y.label"))
        & (F.col("x.vec_id") < F.col("y.vec_id")),
    ).select(
        cos_bin.alias("cos_bin"),
        F.explode(F.array(*hits)).alias("cfg"),
    )
    return (
        pairs.groupBy(
            F.col("cfg.config").alias("config"), "cos_bin"
        )
        .agg(
            F.count("*").alias("pairs"),
            F.sum(F.col("cfg.hit").cast("long")).alias("collided_pairs"),
        )
        .withColumn(
            "collision_rate",
            dround(
                F.col("collided_pairs").cast("double") / F.col("pairs"), 4
            ),
        )
        .orderBy("config", "cos_bin")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN top-k (oracle-exact: shared literal hyperplanes)
# ---------------------------------------------------------------------------

@query(
    "ann_lsh_bucketed_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket AS qbucket
          FROM b ORDER BY vec_id LIMIT 1)
    SELECT e.vec_id, e.label, e.bucket,
           {dround_sql(_COS_SQL.format(a='e.embedding', b='q.qv'), 6)} AS cos_sim
    FROM b e, q
    WHERE e.bucket = q.qbucket AND e.vec_id <> q.qid
    ORDER BY cos_sim DESC NULLS LAST, e.vec_id
    LIMIT {_TOP_K}
    """,
    tags=("llm-similarity",),
)
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucket (8 sign bits), search only
    the query's bucket -- ~1/256 of the corpus at uniform spread. This is
    the 100 TB path: bucket assignment is a per-row projection and the
    candidate scan is partition-prunable on the bucket column when the
    table is written partitioned by it."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
    ).withColumn("bucket", _bucket("v"))
    q = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    return (
        e.join(
            F.broadcast(q),
            (e.bucket == q.qbucket) & (e.vec_id != q.qid),
        )
        .select(
            "vec_id",
            "label",
            "bucket",
            dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH top-k: query bucket + all Hamming-1 neighbor buckets
# ---------------------------------------------------------------------------

@query(
    "ann_multiprobe_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket AS qbucket
          FROM b ORDER BY vec_id LIMIT 1),
    probes AS (
      SELECT qid, qv,
             xor(qbucket,
                 CASE WHEN j.j = {_N_PLANES} THEN 0 ELSE (1 << j.j) END)
               AS bucket
      FROM q, (SELECT unnest(range({_N_PLANES + 1})) AS j) j
    )
    SELECT e.vec_id, e.label, e.bucket,
           {dround_sql(_COS_SQL.format(a='e.embedding', b='p.qv'), 6)} AS cos_sim
    FROM b e JOIN probes p ON e.bucket = p.bucket AND e.vec_id <> p.qid
    ORDER BY cos_sim DESC NULLS LAST, e.vec_id
    LIMIT {_TOP_K}
    """,
    tags=("llm-similarity",),
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: search the query's sign-bit bucket AND its 8
    Hamming-1 neighbors (flip one hyperplane bit each) -- the standard
    recall fix for single-bucket LSH, since true neighbors straddling
    ONE hyperplane land one bit-flip away. Probes are a 9-row exploded
    broadcast equi-joined on the bucket column, so the scan touches
    ~9/256 of the corpus instead of 1/256 with no nonequi join anywhere;
    each corpus vector matches at most one probe (probe buckets are
    distinct), so no pair dedup is needed. Bucket assignment is the same
    md5-seeded hyperplane fold as ann_lsh_bucketed_topk, so the whole
    approximate path stays oracle-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
    ).withColumn("bucket", _bucket("v"))
    q = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    probes = q.select(
        "qid",
        "qv",
        F.explode(
            F.array(
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(_N_PLANES)
                ],
                F.col("qbucket"),
            )
        ).alias("pbucket"),
    )
    return (
        e.join(
            F.broadcast(probes),
            (e.bucket == probes.pbucket) & (e.vec_id != probes.qid),
        )
        .select(
            "vec_id",
            "label",
            "bucket",
            dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# IVF top-k (oracle-exact: centroids via decimal-snapped davg)
# ---------------------------------------------------------------------------

@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT label, i, {davg_sql('CAST(embedding[i] AS DOUBLE)')} AS cx
      FROM embeddings, LATERAL unnest(range(1, {_DIM} + 1)) AS t(i)
      GROUP BY label, i
    ),
    cvec AS (
      SELECT label, list(cx ORDER BY i) AS cv FROM cent GROUP BY label
    ),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings ORDER BY vec_id LIMIT 1),
    probe AS (
      SELECT cvec.label FROM cvec, q
      ORDER BY {_COS_SQL.format(a='cv', b='qv')} DESC NULLS LAST,
               cvec.label ASC NULLS LAST
      LIMIT 2
    )
    SELECT e.vec_id, e.label,
           {dround_sql(_COS_SQL.format(a='e.embedding', b='q.qv'), 6)} AS cos_sim
    FROM embeddings e JOIN probe ON e.label = probe.label, q
    WHERE e.vec_id <> q.qid
    ORDER BY cos_sim DESC NULLS LAST, e.vec_id
    LIMIT {_TOP_K}
    """,
    tags=("llm-similarity",),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: per-label mean centroids built distributively (posexplode
    -> groupBy(label, dim) -> decimal-snapped mean -> re-assemble), probe
    the 2 centroids nearest the query, brute-force only within those
    labels. Centroid build is the only shuffle and reduces to labels x
    dims rows. davg makes the centroids engine-exact, so even this
    approximate path is oracle-checked value-for-value."""
    from ..functions import davg

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", _dvec(F.col("embedding")).alias("v"))

    cent = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(davg("x", "cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("cx")))
                ),
                lambda s: s.getField("cx"),
            ).alias("cv")
        )
    )
    q = (
        e.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    )
    probe = (
        cent.join(F.broadcast(q))
        .select(
            "label", "qid", "qv", _cos(F.col("cv"), F.col("qv")).alias("ccos")
        )
        .orderBy(F.col("ccos").desc(), F.col("label").asc_nulls_last())
        .limit(2)
        .select("label", "qid", "qv")
    )
    return (
        e.join(
            F.broadcast(probe.withColumnRenamed("label", "plabel")),
            (F.col("label") == F.col("plabel")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "vec_id",
            "label",
            dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# Per-label centroids, decimal-exact (the oracle-checkable IVF build)
# ---------------------------------------------------------------------------

@query(
    "label_centroids",
    oracle=f"""
    SELECT label, CAST(i - 1 AS INT) AS dim, {davg_sql('x')} AS centroid
    FROM (
      SELECT label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, LATERAL unnest(range(1, {_DIM} + 1)) AS t(i)
    )
    GROUP BY label, i
    ORDER BY label, dim
    """,
    tags=("llm-similarity",),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid build as an oracle-checked query: posexplode vectors ->
    groupBy(label, dim) -> decimal-snapped mean (davg), so unlike the
    float-avg inside ann_ivf_topk the result is engine-exact. One shuffle
    reducing to labels x dims rows -- fully distributed, no vector ever
    collected to the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(_dvec(F.col("embedding"))).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(davg("x", "centroid"))
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization + reconstruction error (storage-path op)
# ---------------------------------------------------------------------------

@query(
    "embedding_int8_quantization",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, label, dv,
             list_min(dv) AS lo, list_max(dv) AS hi
      FROM v
    ),
    q AS (
      SELECT vec_id, label, dv, lo,
             (hi - lo) / 255.0 AS scale,
             list_transform(dv, x -> CAST(CASE WHEN hi = lo THEN 0
                                          ELSE round((x - lo) /
                                               ((hi - lo) / 255.0))
                                          END AS BIGINT)) AS iq
      FROM s
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           {davg_sql(
               'list_sum(list_transform(range(1, ' + str(_DIM) + ' + 1), '
               'qi -> pow(dv[qi] - (iq[qi] * scale + lo), 2))) / ' + str(_DIM)
           )} AS avg_mse,
           MIN(lo) AS global_min,
           CAST(MAX(list_max(iq)) AS INT) AS max_code
    FROM q
    GROUP BY label
    ORDER BY label
    """,
    tags=("llm-similarity",),
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization (per-vector min/max range -> 0..255 codes)
    with dequantized reconstruction MSE per label -- the 4x storage
    compression step of an embedding pipeline, validated end-to-end:
    quantize, dequantize, and error accounting are all per-row array math
    (no shuffle before the final label rollup)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", _dvec(F.col("embedding")).alias("dv"))
    s = v.select(
        "vec_id", "label", "dv",
        F.array_min("dv").alias("lo"),
        F.array_max("dv").alias("hi"),
    )
    q = s.select(
        "vec_id", "label", "dv", "lo",
        ((F.col("hi") - F.col("lo")) / 255.0).alias("scale"),
        # constant vectors (hi == lo, incl. the all-zero failed-embedding
        # row) quantize to code 0 with EXACT reconstruction (iq*0 + lo =
        # lo = x) -- guarding the range division instead of erroring
        # under ANSI division-by-zero (tests/test_crafted_corpora.py)
        F.transform(
            F.col("dv"),
            lambda x: F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.round(
                    (x - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 255.0)
                )
            )
            .cast("long"),
        ).alias("iq"),
    )
    mse = (
        F.aggregate(
            F.zip_with(
                F.col("dv"),
                F.col("iq"),
                lambda x, c: F.pow(x - (c * F.col("scale") + F.col("lo")), 2),
            ),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        / _DIM
    )
    from ..functions import davg

    return (
        q.select("label", F.col("lo"), mse.alias("mse"),
                 F.array_max("iq").alias("max_code"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            davg("mse", "avg_mse"),
            F.min("lo").alias("global_min"),
            F.max("max_code").cast("int").alias("max_code"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation: LSH-bucketed top-k vs exact top-k on a query sample
# ---------------------------------------------------------------------------

_N_EVAL_Q = 20


@query(
    "ann_recall_eval",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket
          FROM b WHERE vec_id < {_N_EVAL_Q}),
    scored AS MATERIALIZED (
      SELECT q.qid, e.vec_id, e.bucket, q.qbucket,
             {dround_sql('list_cosine_similarity(e.v, q.qv)', 6)} AS cos_sim
      FROM b e, q WHERE e.vec_id <> q.qid
    ),
    exact AS (
      SELECT qid, vec_id FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY cos_sim DESC NULLS LAST, vec_id) <= {_TOP_K}
    ),
    approx AS (
      SELECT qid, vec_id, 1 AS hit FROM scored WHERE bucket = qbucket
      QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY cos_sim DESC NULLS LAST, vec_id) <= {_TOP_K}
    )
    SELECT x.qid,
           COUNT(*) AS exact_k,
           CAST(COUNT(a.hit) AS BIGINT) AS ann_hits,
           {dround_sql(f'COUNT(a.hit) / {_TOP_K}.0', 4)} AS recall_at_k
    FROM exact x
    LEFT JOIN approx a ON x.qid = a.qid AND x.vec_id = a.vec_id
    GROUP BY x.qid
    ORDER BY x.qid
    """,
    tags=("llm-similarity",),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against exact cosine top-k over a
    {20}-query evaluation sample — the accuracy/cost dial every ANN
    deployment must report before swapping approximate for exact.

    Shape at scale: the query sample is tiny and BROADCAST; exact
    scoring is corpus x sample (the standard sampled-recall eval, NOT
    corpus x corpus); ranking is a per-qid window over the sample's
    score lists. Recall here is an eval metric on a sample, so the same
    job works unchanged when the corpus is partitioned by bucket."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    ).withColumn("bucket", _bucket("v"))
    q = e.filter(F.col("vec_id") < _N_EVAL_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        e.join(F.broadcast(q), e.vec_id != q.qid)
        .select(
            "qid",
            "vec_id",
            "bucket",
            "qbucket",
            dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "vec_id")
    )
    approx = (
        scored.filter(F.col("bucket") == F.col("qbucket"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        exact.join(approx, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("*").alias("exact_k"),
            F.count("hit").alias("ann_hits"),
            dround(F.count("hit") / F.lit(float(_TOP_K)), 4).alias(
                "recall_at_k"
            ),
        )
        .orderBy("qid")
    )


@query(
    "ann_probe_sweep_recall",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket
          FROM b WHERE vec_id < {_N_EVAL_Q}),
    scored AS MATERIALIZED (
      SELECT q.qid, e.vec_id, e.bucket, q.qbucket,
             {dround_sql('list_cosine_similarity(e.v, q.qv)', 6)} AS cos_sim
      FROM b e, q WHERE e.vec_id <> q.qid
    ),
    exact AS (
      SELECT qid, vec_id FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY cos_sim DESC NULLS LAST, vec_id) <= {_TOP_K}
    ),
    cand AS (
      SELECT 'multi_probe' AS method, * FROM scored
      WHERE bit_count(xor(bucket, qbucket)) <= 1
      UNION ALL
      SELECT 'single_bucket' AS method, * FROM scored
      WHERE bucket = qbucket
    ),
    approx AS (
      SELECT method, qid, vec_id FROM cand
      QUALIFY row_number() OVER (PARTITION BY method, qid
                ORDER BY cos_sim DESC NULLS LAST, vec_id) <= {_TOP_K}
    ),
    methods AS (SELECT unnest(['multi_probe', 'single_bucket']) AS method),
    per_q_recall AS (
      SELECT m.method, x.qid,
             COUNT(a.vec_id) / {_TOP_K}.0 AS recall
      FROM exact x
      CROSS JOIN methods m
      LEFT JOIN approx a ON a.method = m.method AND a.qid = x.qid
                        AND a.vec_id = x.vec_id
      GROUP BY m.method, x.qid
    ),
    per_q_cost AS (
      SELECT m.method, q.qid, CAST(COUNT(c.vec_id) AS BIGINT) AS n_cand
      FROM q CROSS JOIN methods m
      LEFT JOIN cand c ON c.method = m.method AND c.qid = q.qid
      GROUP BY m.method, q.qid
    )
    SELECT r.method,
           {davg_sql('r.recall')} AS mean_recall_at_k,
           {davg_sql('c.n_cand')} AS avg_candidates
    FROM per_q_recall r
    JOIN per_q_cost c ON r.method = c.method AND r.qid = c.qid
    GROUP BY r.method
    ORDER BY r.method
    """,
    tags=("llm-similarity",),
)
def ann_probe_sweep_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN accuracy/cost dial, measured: mean recall@k and mean
    candidate-set size per query for single-bucket LSH vs multi-probe
    (bucket + all Hamming-1 neighbors, the ann_multiprobe_topk shape)
    over the same evaluation sample as ann_recall_eval. Multi-probe
    should buy substantially higher recall for ~9x the (still tiny)
    candidate cost -- this op turns that claim into a number a pipeline
    owner can read before choosing a probe count. Same scale shape as
    ann_recall_eval: broadcast query sample, corpus x sample scoring,
    per-(method, qid) windows."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    ).withColumn("bucket", _bucket("v"))
    q = e.filter(F.col("vec_id") < _N_EVAL_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = e.join(F.broadcast(q), e.vec_id != q.qid).select(
        "qid",
        "vec_id",
        "bucket",
        "qbucket",
        dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "vec_id")
    )
    hamming = F.bit_count(
        F.col("bucket").bitwiseXOR(F.col("qbucket"))
    )
    cand = scored.filter(hamming <= 1).withColumn(
        "method", F.lit("multi_probe")
    ).unionByName(
        scored.filter(F.col("bucket") == F.col("qbucket")).withColumn(
            "method", F.lit("single_bucket")
        )
    )
    wm = Window.partitionBy("method", "qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    approx = (
        cand.withColumn("rnk", F.row_number().over(wm))
        .filter(F.col("rnk") <= _TOP_K)
        .select("method", "qid", "vec_id")
    )
    methods = spark.createDataFrame(
        [("multi_probe",), ("single_bucket",)], "method string"
    )
    per_q_recall = (
        exact.crossJoin(F.broadcast(methods))
        .join(approx, ["method", "qid", "vec_id"], "left_semi")
        .groupBy("method", "qid")
        .agg((F.count("*") / F.lit(float(_TOP_K))).alias("recall"))
    )
    # zero-recall (method, qid) cells vanish from the left-semi count;
    # re-anchor on the full method x qid grid so means divide by all
    # sample queries on both engines
    grid = q.select("qid").crossJoin(F.broadcast(methods))
    per_q_recall = (
        grid.join(per_q_recall, ["method", "qid"], "left")
        .select(
            "method",
            "qid",
            F.coalesce(F.col("recall"), F.lit(0.0)).alias("recall"),
        )
    )
    per_q_cost = (
        grid.join(cand, ["method", "qid"], "left")
        .groupBy("method", "qid")
        .agg(F.count("vec_id").cast("long").alias("n_cand"))
    )
    return (
        per_q_recall.join(per_q_cost, ["method", "qid"])
        .groupBy("method")
        .agg(
            davg("recall", "mean_recall_at_k"),
            davg("n_cand", "avg_candidates"),
        )
        .orderBy("method")
    )


# ---------------------------------------------------------------------------
# Semantic search: ANN hits joined back to document metadata
# ---------------------------------------------------------------------------

@query(
    "semantic_search_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv
               FROM embeddings ORDER BY vec_id LIMIT 1),
    hits AS (
      SELECT e.vec_id,
             {dround_sql(_COS_SQL.format(a='e.embedding', b='q.qv'), 6)}
               AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> q.qid
      ORDER BY cos_sim DESC NULLS LAST, e.vec_id
      LIMIT {_TOP_K}
    )
    SELECT h.vec_id AS doc_id, d.lang, d.source,
           substr(d.text, 1, 40) AS snippet, h.cos_sim
    FROM hits h JOIN documents d ON h.vec_id = d.doc_id
    ORDER BY h.cos_sim DESC NULLS LAST, doc_id
    """,
    tags=("llm-similarity", "llm-text"),
)
def semantic_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-user semantic search: exact cosine top-k over the embedding
    table, then the k WINNERS (and only the winners) join back to the
    aligned documents table (vec_id == doc_id) for language, source,
    and a text snippet — the read path a retrieval service serves.

    Scale shape: the query vector broadcasts, top-k compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort), and
    the metadata join happens AFTER the LIMIT — k rows join against
    documents on its key, so the text payload of the other billion
    docs is never read, let alone shuffled."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            _dvec(F.col("embedding")).alias("qv"),
            _norm(_dvec(F.col("embedding"))).alias("qn"),
        )
    )
    hits = (
        emb.join(F.broadcast(q), emb.vec_id != F.col("qid"))
        .select(
            "vec_id",
            dround(
                _cos_pre(
                    _dvec(F.col("embedding")),
                    _norm(_dvec(F.col("embedding"))),
                    F.col("qv"),
                    F.col("qn"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )
    return (
        hits.join(docs, hits.vec_id == docs.doc_id)
        .select(
            "doc_id",
            "lang",
            "source",
            F.substring("text", 1, 40).alias("snippet"),
            "cos_sim",
        )
        .orderBy(F.col("cos_sim").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# Cross-modal agreement: embedding-LSH candidates vs text-shingle Jaccard
# ---------------------------------------------------------------------------

from .dedup import _JACCARD_THRESHOLD as _TEXT_JACCARD_THR  # noqa: E402
from .dedup import _SHINGLES_SQL as _TEXT_SHINGLES_SQL  # noqa: E402


@query(
    "crossmodal_neardup_agreement",
    oracle=f"""
    WITH sample AS MATERIALIZED (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE label < {_RECALL_SAMPLE_LABELS}
    ),
    {_embed_band_ctes('sample')},
    sh AS (SELECT doc_id, {{SHINGLES}} AS shingles FROM documents),
    scored AS (
      SELECT {_COS_SQL.format(a='p.ea', b='p.eb')} AS cs,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
               AS jac
      FROM cand p
      JOIN sh sa ON p.vec_a = sa.doc_id
      JOIN sh sb ON p.vec_b = sb.doc_id
    )
    SELECT CASE WHEN cs >= 0.5 THEN '[0.5,1.0]'
                WHEN cs >= {_NEAR_DUP_COS} THEN '[{_NEAR_DUP_COS},0.5)'
                ELSE '<{_NEAR_DUP_COS}' END AS cos_bin,
           COUNT(*) AS pairs,
           {davg_sql('jac')} AS mean_text_jaccard,
           {dround_sql('CAST(SUM(CASE WHEN jac >= {JT} THEN 1 ELSE 0 END)'
                       ' AS DOUBLE) / COUNT(*)', 4)} AS text_dup_rate
    FROM scored
    GROUP BY cos_bin
    ORDER BY cos_bin
    """.replace("{SHINGLES}", _TEXT_SHINGLES_SQL).replace(
        "{JT}", str(_TEXT_JACCARD_THR)
    ),
    tags=("llm-similarity", "llm-dedup", "multimodal"),
)
def crossmodal_neardup_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal verification: every embedding-LSH candidate pair (the
    banded self-join on sample labels) is re-scored in TEXT space via
    the aligned documents table (vec_id == doc_id) — word-3-gram shingle
    Jaccard, the minhash verifier's exact metric. Reports, per cosine
    bin, the candidate count, mean text Jaccard, and the fraction that
    clears the text near-dup threshold.

    This is the agreement audit a multimodal pipeline runs before
    trusting one modality's dedup verdicts for the other: high-cosine
    bins should show rising text overlap, and the below-threshold bin
    documents the false-candidate rate the cosine verify filters out.
    Scale shape: the band-keyed candidate join is the measured
    embedding_near_dup_pairs shape; the shingle sides join by doc_id
    AFTER pair formation (text payloads never ride the band
    explosion)."""
    from ._embed_lsh_udf import make_embed_bands_udf
    from .dedup import with_shingles

    bands_udf = make_embed_bands_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    sample = emb.filter(F.col("label") < _RECALL_SAMPLE_LABELS).select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
        bands_udf(F.col("embedding")).alias("bands"),
    )
    cand = _embed_candidate_pairs(sample)
    sh = with_shingles(docs)
    sa, sb = sh.alias("sa"), sh.alias("sb")
    jac = (
        F.size(
            F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))
        ).cast("double")
        / F.size(F.array_union(F.col("sa.shingles"), F.col("sb.shingles")))
    )
    scored = (
        cand.join(sa, cand.vec_a == F.col("sa.doc_id"))
        .join(sb, cand.vec_b == F.col("sb.doc_id"))
        .select(F.col("cos_sim").alias("cs"), jac.alias("jac"))
    )
    cos_bin = (
        F.when(F.col("cs") >= 0.5, F.lit("[0.5,1.0]"))
        .when(
            F.col("cs") >= _NEAR_DUP_COS,
            F.lit(f"[{_NEAR_DUP_COS},0.5)"),
        )
        .otherwise(F.lit(f"<{_NEAR_DUP_COS}"))
    )
    return (
        scored.groupBy(cos_bin.alias("cos_bin"))
        .agg(
            F.count("*").alias("pairs"),
            davg("jac", "mean_text_jaccard"),
            dround(
                F.sum(
                    (F.col("jac") >= _TEXT_JACCARD_THR).cast("long")
                ).cast("double")
                / F.count("*"),
                4,
            ).alias("text_dup_rate"),
        )
        .orderBy("cos_bin")
    )


# ---------------------------------------------------------------------------
# Paraphrase mining: semantically NEAR, lexically FAR. The near-dup
# family's inverse predicate -- crossmodal_neardup_agreement AGGREGATES
# how often the modalities agree; this op EMITS the disagreement pairs
# (high cosine, low shingle Jaccard), which are exactly the paraphrase /
# rewrite candidates a training pipeline mines for augmentation sets and
# contrastive positives (and that a dedup pipeline must NOT collapse).
# ---------------------------------------------------------------------------

_PARA_COS = 0.5  # the crossmodal audit's high-agreement bin boundary


@query(
    "paraphrase_mining_pairs",
    oracle=f"""
    WITH {_embed_band_ctes('embeddings')},
    sh AS (SELECT doc_id, {{SHINGLES}} AS shingles FROM documents),
    scored AS (
      SELECT p.vec_a, p.vec_b,
             {_COS_SQL.format(a='p.ea', b='p.eb')} AS cos_raw,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
               AS jac
      FROM cand p
      JOIN sh sa ON p.vec_a = sa.doc_id
      JOIN sh sb ON p.vec_b = sb.doc_id
    )
    SELECT vec_a AS doc_a, vec_b AS doc_b,
           {dround_sql('cos_raw', 4)} AS cos_sim,
           {dround_sql('jac', 4)} AS text_jaccard
    FROM scored
    WHERE cos_raw >= {_PARA_COS} AND jac < {_TEXT_JACCARD_THR}
    ORDER BY cos_sim DESC, doc_a, doc_b
    """.replace("{SHINGLES}", _TEXT_SHINGLES_SQL),
    tags=("llm-similarity", "llm-dedup"),
)
def paraphrase_mining_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paraphrase candidates: embedding-LSH pairs whose UNROUNDED cosine
    clears the crossmodal high-agreement boundary ({pc}) but whose
    word-3-gram shingle Jaccard stays BELOW the lexical near-dup
    threshold ({jt}) -- same meaning, different words. Both thresholds
    and both metrics are the established family primitives
    (_embed_candidate_pairs + with_shingles), so the op adds a predicate,
    not a new similarity definition.

    Scale shape: candidates come from the measured band-keyed LSH
    self-join (vectors never ride the band explosion); the shingle
    sides join by doc_id AFTER pair formation AND after the cosine
    filter, so text payloads move once per surviving high-cosine pair
    -- strictly cheaper than crossmodal_neardup_agreement, which scores
    every candidate. Cosine filtering uses cos_raw (the r6 ADVICE
    boundary discipline); emitted values snap to 4 decimals with ties
    ordered by (doc_a, doc_b)."""
    from ._embed_lsh_udf import make_embed_bands_udf
    from .dedup import with_shingles

    bands_udf = make_embed_bands_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    e = emb.select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
        bands_udf(F.col("embedding")).alias("bands"),
    )
    cand = _embed_candidate_pairs(e).filter(F.col("cos_raw") >= _PARA_COS)
    sh = with_shingles(docs)
    sa, sb = sh.alias("sa"), sh.alias("sb")
    jac = (
        F.size(
            F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))
        ).cast("double")
        / F.size(F.array_union(F.col("sa.shingles"), F.col("sb.shingles")))
    )
    return (
        cand.join(sa, cand.vec_a == F.col("sa.doc_id"))
        .join(sb, cand.vec_b == F.col("sb.doc_id"))
        .filter(jac < _TEXT_JACCARD_THR)
        .select(
            F.col("vec_a").alias("doc_a"),
            F.col("vec_b").alias("doc_b"),
            dround(F.col("cos_raw"), 4).alias("cos_sim"),
            dround(jac, 4).alias("text_jaccard"),
        )
        .orderBy(F.col("cos_sim").desc(), "doc_a", "doc_b")
    )


paraphrase_mining_pairs.__doc__ = paraphrase_mining_pairs.__doc__.format(
    pc=_PARA_COS, jt=_TEXT_JACCARD_THR
)


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep): for each query
# vector, the single most-similar vector with a DIFFERENT label -- the
# exact brute-force baseline of the "mine hard negatives for every
# anchor" stage of contrastive/embedding training.
# ---------------------------------------------------------------------------

_HN_QUERIES = 8


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv
          FROM v ORDER BY vec_id LIMIT {_HN_QUERIES}),
    scored AS (
      SELECT q.qid, q.qlabel, v.vec_id, v.label,
             {dround_sql(_COS_SQL.format(a='v.v', b='q.qv'), 6)} AS cos_sim
      FROM v CROSS JOIN q
      WHERE v.label <> q.qlabel
    )
    SELECT qid, qlabel, vec_id AS neg_id, label AS neg_label, cos_sim
    FROM scored
    WHERE cos_sim IS NOT NULL
    QUALIFY row_number() OVER (
      PARTITION BY qid ORDER BY cos_sim DESC, vec_id) = 1
    ORDER BY qid
    """,
    tags=("llm-similarity",),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 cross-label neighbor per anchor (hard negative).

    Scale shape: the anchor set is a broadcast (queries are a tiny,
    explicitly bounded batch); the corpus streams past it in ONE pass
    and the per-anchor argmax is a partial-aggregable struct-max
    (map-side combine reduces every partition to |anchors| rows before
    the single tiny shuffle) -- deliberately NOT a window over the
    scored pairs, whose |anchors| hot partitions would straggle at
    100 TB. Tie-break: highest snapped cosine, then lowest vec_id
    (negated id inside the max struct); zero-norm vectors drop out via
    the NULL-cosine guard on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _dvec(F.col("embedding")).alias("v")
    )
    q = (
        emb.orderBy("vec_id")
        .limit(_HN_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim").isNotNull())
    )
    best = scored.groupBy("qid", "qlabel").agg(
        F.max(
            F.struct(
                F.col("cos_sim"),
                (-F.col("vec_id")).alias("nid"),
                F.col("label").alias("nlabel"),
            )
        ).alias("b")
    )
    return best.select(
        "qid",
        "qlabel",
        (-F.col("b.nid")).alias("neg_id"),
        F.col("b.nlabel").alias("neg_label"),
        F.col("b.cos_sim").alias("cos_sim"),
    ).orderBy("qid")


# ---------------------------------------------------------------------------
# Product quantization (PQ): subspace codebooks + assignment statistics
# ---------------------------------------------------------------------------

_PQ_M = 4                      # subspaces
_PQ_SUBDIM = _DIM // _PQ_M     # dims per subspace
_PQ_K = 8                      # codewords per subspace

_PQ_MD5 = "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"


def _pq_dlit(x: float) -> str:
    """Shortest-roundtrip double literal: Java's correctly-rounded
    parser maps it back to the same binary64 Python's repr came from.
    Non-finite values would emit 'infD'/'nanD' (a SQL parse error far
    from the cause), so fail at build time with a clear message."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(
            f"non-finite PQ literal {x!r}: degenerate codebook/query"
            " vector (inf/nan embedding component)"
        )
    return repr(x) + "D"


def _pq_sqdist_sql(codebook: list[list[float]], s: int, c: int) -> str:
    """Subspace-s squared distance of column ``v`` to codeword c, as
    SQL text (same left-to-right term fold the old F.lit chain built --
    the SQL-string form exists because per-literal Column construction
    cost ~9 s of driver-side py4j round-trips per PQ op, the r18 stage
    audit's finding)."""
    base = s * _PQ_SUBDIM
    return " + ".join(
        f"(v[{base + i}] - {_pq_dlit(codebook[c][base + i])})"
        f" * (v[{base + i}] - {_pq_dlit(codebook[c][base + i])})"
        for i in range(_PQ_SUBDIM)
    )


def _pq_argmin_sql(codebook: list[list[float]], s: int) -> str:
    """array_min over (d, c) structs: nearest codeword of subspace s,
    ties resolving by code id (struct field order), identical to the
    old F.array_min(F.struct(...)) tree."""
    structs = ", ".join(
        f"named_struct('d', {_pq_sqdist_sql(codebook, s, c)},"
        f" 'c', CAST({c} AS INT))"
        for c in range(_PQ_K)
    )
    return f"array_min(array({structs}))"


@query(
    "pq_codebook_stats",
    oracle=f"""
    WITH ranked AS (
      SELECT CAST(embedding AS DOUBLE[]) AS cv,
             ROW_NUMBER() OVER (ORDER BY {_PQ_MD5}, vec_id) AS rn
      FROM embeddings
      QUALIFY rn <= {_PQ_K}
    ),
    cb AS (SELECT CAST(rn - 1 AS INT) AS code, cv FROM ranked),
    sub AS (SELECT CAST(s AS INT) AS subspace FROM range({_PQ_M}) t(s)),
    dist AS (
      SELECT e.vec_id, sub.subspace, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}), i ->
               (e.ev[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
               * (e.ev[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
             )) AS sqdist
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
            FROM embeddings) e, sub, cb
    ),
    best AS (
      SELECT subspace, code, sqdist
      FROM dist
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY sqdist, code) = 1
    )
    SELECT subspace, code,
           COUNT(*) AS n_vectors,
           {davg_sql('sqdist')} AS avg_sqdist
    FROM best
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("llm-similarity",),
)
def pq_codebook_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jegou et al.): split each vector into
    {m} x {d}-dim subspaces, quantize each subvector to its nearest of
    {k} codewords, report codeword occupancy and mean squared
    reconstruction error per (subspace, code) -- the compression/recall
    profile an IVF-PQ index is tuned on. Codewords are the {k}
    md5-rank-selected corpus vectors (deterministic sampling: both
    engines derive the IDENTICAL codebook from the data, keeping the
    oracle hash-exact; a production build would Lloyd-refine per
    subspace, same assignment plan).

    Scale shape: the codebook is a bounded {k}-row TakeOrdered +
    collect (never grows with the corpus), inlined as LITERALS into the
    assignment expression -- so assignment is one embarrassingly-
    parallel scan projecting {m} argmin structs per row with NO join
    and NO shuffle of vector data; the only exchange aggregates
    ({m} x {k})-group partials. Distances fold dimension-by-dimension
    left-to-right in both engines, so argmin ties (exact-equal doubles)
    resolve identically by code id."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _dvec(F.col("embedding")).alias("v"))
    # bounded K-row materialization: md5-ranked codeword sample
    cb_rows = (
        e.select(
            "vec_id",
            "v",
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(_PQ_K)
        .collect()
    )
    codebook = [list(r["v"]) for r in cb_rows]  # K x DIM doubles

    asg = e.selectExpr(
        *[f"{_pq_argmin_sql(codebook, s)} AS s{s}" for s in range(_PQ_M)]
    )
    stacked = asg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("subspace"),
                        F.col(f"s{s}.c").alias("code"),
                        F.col(f"s{s}.d").alias("sqdist"),
                    )
                    for s in range(_PQ_M)
                ]
            )
        ).alias("x")
    ).select("x.*")
    return (
        stacked.groupBy("subspace", "code")
        .agg(
            F.count("*").alias("n_vectors"),
            davg("sqdist", "avg_sqdist"),
        )
        .orderBy("subspace", "code")
    )


pq_codebook_stats.__doc__ = pq_codebook_stats.__doc__.format(
    m=_PQ_M, d=_PQ_SUBDIM, k=_PQ_K
)


# ---------------------------------------------------------------------------
# Matryoshka truncation recall: top-k fidelity after halving stored dims
# ---------------------------------------------------------------------------

_TRUNC_DIM = _DIM // 2


@query(
    "ann_dim_truncation_recall",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM b WHERE vec_id < {_N_EVAL_Q}),
    scored AS MATERIALIZED (
      SELECT q.qid, e.vec_id,
             {dround_sql(_COS_SQL.format(a='e.v', b='q.qv'), 6)}
               AS cos_full,
             {dround_sql(_COS_SQL.format(
                 a=f'e.v[1:{_TRUNC_DIM}]',
                 b=f'q.qv[1:{_TRUNC_DIM}]'), 6)}
               AS cos_trunc
      FROM b e, q WHERE e.vec_id <> q.qid
    ),
    exact AS (
      SELECT qid, vec_id FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY cos_full DESC NULLS LAST, vec_id) <= {_TOP_K}
    ),
    approx AS (
      SELECT qid, vec_id, 1 AS hit FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY cos_trunc DESC NULLS LAST, vec_id) <= {_TOP_K}
    )
    SELECT x.qid,
           COUNT(*) AS exact_k,
           CAST(COUNT(a.hit) AS BIGINT) AS trunc_hits,
           {dround_sql(f'COUNT(a.hit) / {_TOP_K}.0', 4)} AS recall_at_k
    FROM exact x
    LEFT JOIN approx a ON x.qid = a.qid AND x.vec_id = a.vec_id
    GROUP BY x.qid
    ORDER BY x.qid
    """,
    tags=("llm-similarity",),
)
def ann_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation eval (Kusupati et al.,
    public MRL paper): recall@k of cosine top-k computed on the FIRST
    {half} of {dim} dimensions against the full-dimension exact top-k,
    per evaluation query. This is the decision table for storing
    truncated vectors (2x less IO/memory per scan) with full-dim
    rescoring only on the short list.

    Shape at scale: identical to ann_recall_eval -- the {nq}-query
    sample is a tiny broadcast, scoring is corpus x sample in one pass
    (both cosines ride the SAME row visit, so truncation adds no second
    scan), ranking is a per-qid window over the sample's score lists."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _dvec(F.col("embedding")).alias("v"))
    q = e.filter(F.col("vec_id") < _N_EVAL_Q).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = e.join(F.broadcast(q), e.vec_id != q.qid).select(
        "qid",
        "vec_id",
        dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_full"),
        dround(
            _cos(
                F.slice(F.col("v"), 1, _TRUNC_DIM),
                F.slice(F.col("qv"), 1, _TRUNC_DIM),
            ),
            6,
        ).alias("cos_trunc"),
    )
    w_full = Window.partitionBy("qid").orderBy(
        F.col("cos_full").desc(), F.col("vec_id")
    )
    w_trunc = Window.partitionBy("qid").orderBy(
        F.col("cos_trunc").desc(), F.col("vec_id")
    )
    exact = (
        scored.withColumn("rnk", F.row_number().over(w_full))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "vec_id")
    )
    approx = (
        scored.withColumn("rnk", F.row_number().over(w_trunc))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        exact.join(approx, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("*").alias("exact_k"),
            F.count("hit").alias("trunc_hits"),
            dround(F.count("hit") / F.lit(float(_TOP_K)), 4).alias(
                "recall_at_k"
            ),
        )
        .orderBy("qid")
    )


ann_dim_truncation_recall.__doc__ = ann_dim_truncation_recall.__doc__.format(
    half=_TRUNC_DIM, dim=_DIM, nq=_N_EVAL_Q
)


# ---------------------------------------------------------------------------
# Binary (sign-bit) quantization + Hamming top-k
# ---------------------------------------------------------------------------

_HAM_WORD_BITS = 32
_HAM_N_WORDS = _DIM // _HAM_WORD_BITS


def _sign_word(v: Column, w: int) -> Column:
    """Bits w*32 .. w*32+31 of the sign signature packed into a long
    (32 bits per word keeps every term far from 2^63 overflow)."""
    out = None
    for i in range(_HAM_WORD_BITS):
        d = w * _HAM_WORD_BITS + i
        bit = (
            F.when(v[d] > 0, F.lit(1 << i))
            .otherwise(F.lit(0))
            .cast("long")
        )
        out = bit if out is None else out + bit
    return out


def _sign_word_sql(vec: str, w: int) -> str:
    terms = [
        f"(CASE WHEN {vec}[{w * _HAM_WORD_BITS + i + 1}] > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(_HAM_WORD_BITS)
    ]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def _hamming_sql() -> str:
    return " + ".join(
        f"bit_count(xor(e.w{w}, q.qw{w}))" for w in range(_HAM_N_WORDS)
    )


@query(
    "embedding_sign_hamming_topk",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             {', '.join(
                 f"{_sign_word_sql('CAST(embedding AS DOUBLE[])', w)} AS w{w}"
                 for w in range(_HAM_N_WORDS)
             )}
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv,
                 {', '.join(f'w{w} AS qw{w}' for w in range(_HAM_N_WORDS))}
          FROM b ORDER BY vec_id LIMIT 1)
    SELECT e.vec_id, e.label,
           CAST({_hamming_sql()} AS BIGINT) AS hamming,
           {dround_sql(_COS_SQL.format(a='e.v', b='q.qv'), 6)} AS cos_exact
    FROM b e, q WHERE e.vec_id <> q.qid
    ORDER BY hamming, e.vec_id
    LIMIT {_TOP_K}
    """,
    tags=("llm-similarity",),
)
def embedding_sign_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization ANN: each vector compresses to its {dim}-bit
    sign signature (1 bit/dim = 64x smaller than float32; the standard
    binary-embedding trick) and candidates rank by Hamming distance --
    bit_count(xor) over two 32-bit words -- with the exact cosine
    attached for rescoring. Sign(0) maps to 0 in BOTH engines (strict
    > 0), so the signature is engine-exact; Hamming is integer, so the
    top-k (ties broken by vec_id) is hash-exact too.

    Shape at scale: signatures are computed in the scan projection (no
    shuffle of float payloads -- a production table would PERSIST the
    two words and skip the vectors entirely on the candidate pass);
    the query is a 1-row broadcast and top-k compiles to
    TakeOrderedAndProject. This is the candidate-generation half of a
    binary-quantized index; embedding_int8_quantization is the
    storage-compression cousin."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        _dvec(F.col("embedding")).alias("v"),
    ).select(
        "vec_id",
        "label",
        "v",
        *[_sign_word(F.col("v"), w).alias(f"w{w}") for w in range(_HAM_N_WORDS)],
    )
    q = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            *[F.col(f"w{w}").alias(f"qw{w}") for w in range(_HAM_N_WORDS)],
        )
    )
    ham = None
    for w in range(_HAM_N_WORDS):
        term = F.bit_count(F.col(f"w{w}").bitwiseXOR(F.col(f"qw{w}")))
        ham = term if ham is None else ham + term
    return (
        e.join(F.broadcast(q), e.vec_id != q.qid)
        .select(
            "vec_id",
            "label",
            ham.cast("long").alias("hamming"),
            dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_exact"),
        )
        .orderBy("hamming", "vec_id")
        .limit(_TOP_K)
    )


embedding_sign_hamming_topk.__doc__ = embedding_sign_hamming_topk.__doc__.format(
    dim=_DIM
)


# ---------------------------------------------------------------------------
# k-NN neighborhood label purity (dataset-quality / mislabel signal)
# ---------------------------------------------------------------------------

@query(
    "knn_label_purity",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv
          FROM b WHERE vec_id < {_N_EVAL_Q}),
    scored AS (
      SELECT q.qid, q.qlabel, e.label,
             {dround_sql(_COS_SQL.format(a='e.v', b='q.qv'), 6)} AS cos_sim,
             e.vec_id
      FROM b e, q WHERE e.vec_id <> q.qid
    ),
    knn AS (
      SELECT qid, qlabel, label FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY cos_sim DESC NULLS LAST, vec_id) <= {_TOP_K}
    )
    SELECT qid, ANY_VALUE(qlabel) AS qlabel,
           CAST(SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
             AS knn_hits,
           {dround_sql(
               f'SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END)'
               f' / {_TOP_K}.0', 4)} AS purity
    FROM knn
    GROUP BY qid
    ORDER BY qid
    """,
    tags=("llm-similarity",),
)
def knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN neighborhood label agreement: for each evaluation query, the
    fraction of its {k} exact-cosine nearest neighbors sharing the
    query's label -- the standard embedding-space sanity metric for a
    labeled corpus (low purity flags mislabeled rows or a collapsed
    embedding space; the per-example form of a kNN-classifier eval).

    Shape at scale: the {nq}-query sample broadcasts; scoring is
    corpus x sample in one pass; ranking is a per-qid window over the
    sample's score lists -- the sampled-eval shape, never
    corpus x corpus."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", _dvec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < _N_EVAL_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = e.join(F.broadcast(q), e.vec_id != q.qid).select(
        "qid",
        "qlabel",
        "label",
        dround(_cos(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        "vec_id",
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    hits = F.sum(
        F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .groupBy("qid")
        .agg(
            F.any_value(F.col("qlabel")).alias("qlabel"),
            hits.cast("long").alias("knn_hits"),
            dround(hits / F.lit(float(_TOP_K)), 4).alias("purity"),
        )
        .orderBy("qid")
    )


knn_label_purity.__doc__ = knn_label_purity.__doc__.format(
    k=_TOP_K, nq=_N_EVAL_Q
)


# ---------------------------------------------------------------------------
# Distance-to-own-centroid outliers (mislabel / contamination detection)
# ---------------------------------------------------------------------------

_OUTLIER_TOPN = 20


@query(
    "label_centroid_outliers",
    oracle=f"""
    WITH comp AS (
      SELECT label, vec_id, g.i,
             CAST(embedding AS DOUBLE[])[g.i] AS x
      FROM embeddings, generate_series(1, {_DIM}) AS g(i)
    ),
    cent AS (
      SELECT label, i, {davg_sql('x')} AS c
      FROM comp GROUP BY label, i
    ),
    cv AS (
      SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label
    )
    SELECT e.vec_id, e.label,
           {dround_sql(
               'sqrt(list_reduce(list_transform(range(1, ' + str(_DIM + 1)
               + '), i -> (CAST(e.embedding AS DOUBLE[])[i] - cv.cv[i])'
               ' * (CAST(e.embedding AS DOUBLE[])[i] - cv.cv[i])),'
               ' (a, b) -> a + b))', 6)} AS dist
    FROM embeddings e JOIN cv ON e.label = cv.label
    ORDER BY dist DESC, e.vec_id
    LIMIT {_OUTLIER_TOPN}
    """,
    tags=("llm-similarity",),
)
def label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel / contamination detector: euclidean distance from every
    vector to ITS OWN label centroid, reporting the {n} farthest rows --
    the classic confident-learning-style triage list a labeling pass
    reviews first. Centroids are davg-snapped per (label, dim), so both
    engines derive the IDENTICAL centroid and the ranking is hash-exact
    (ties broken by vec_id).

    Shape at scale: the centroid build is posexplode -> (label, dim)
    partial aggregation (labels x dims rows, independent of corpus
    size -- same fully-distributed build as ann_ivf_topk); the
    label-keyed centroid table is a tiny broadcast; distances are
    per-row folds; the report compiles to TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", _dvec(F.col("embedding")).alias("v")
    )
    comp = e.select(
        "label", F.posexplode(F.col("v")).alias("dim", "x")
    )
    cent = comp.groupBy("label", "dim").agg(davg("x", "c"))
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    )
    sq = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return (
        e.join(F.broadcast(cent_arr), "label")
        .select(
            "vec_id",
            "label",
            dround(F.sqrt(sq), 6).alias("dist"),
        )
        .orderBy(F.col("dist").desc(), "vec_id")
        .limit(_OUTLIER_TOPN)
    )


label_centroid_outliers.__doc__ = label_centroid_outliers.__doc__.format(
    n=_OUTLIER_TOPN
)


# ---------------------------------------------------------------------------
# PQ asymmetric-distance search (ADC) + exact re-rank: the memory-bound
# production serving shape (Jegou et al.; FAISS IndexPQ / ScaNN rescoring)
# ---------------------------------------------------------------------------

_PQ_TOP_K = 10
_PQ_RERANK = 30


@query(
    "pq_adc_topk_recall",
    oracle=f"""
    WITH ranked AS (
      SELECT CAST(embedding AS DOUBLE[]) AS cv,
             ROW_NUMBER() OVER (ORDER BY {_PQ_MD5}, vec_id) AS rn
      FROM embeddings
      QUALIFY rn <= {_PQ_K}
    ),
    cb AS (SELECT CAST(rn - 1 AS INT) AS code, cv FROM ranked),
    sub AS (SELECT CAST(s AS INT) AS subspace FROM range({_PQ_M}) t(s)),
    q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 1
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
          FROM embeddings),
    adc AS (
      SELECT sub.subspace, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}), i ->
               (q.qv[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
               * (q.qv[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
             )) AS d
      FROM sub, cb, q
    ),
    dist AS (
      SELECT e.vec_id, sub.subspace, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}), i ->
               (e.ev[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
               * (e.ev[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
             )) AS sqdist
      FROM e, sub, cb
    ),
    best AS (
      SELECT vec_id, subspace, code
      FROM dist
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY sqdist, code) = 1
    ),
    piv AS (
      SELECT vec_id,
             MAX(CASE WHEN subspace = 0 THEN code END) AS c0,
             MAX(CASE WHEN subspace = 1 THEN code END) AS c1,
             MAX(CASE WHEN subspace = 2 THEN code END) AS c2,
             MAX(CASE WHEN subspace = 3 THEN code END) AS c3
      FROM best GROUP BY vec_id
    ),
    scored AS (
      SELECT p.vec_id,
             {dround_sql('a0.d + a1.d + a2.d + a3.d', 6)} AS adc_dist
      FROM piv p
      JOIN adc a0 ON a0.subspace = 0 AND a0.code = p.c0
      JOIN adc a1 ON a1.subspace = 1 AND a1.code = p.c1
      JOIN adc a2 ON a2.subspace = 2 AND a2.code = p.c2
      JOIN adc a3 ON a3.subspace = 3 AND a3.code = p.c3
      CROSS JOIN q
      WHERE p.vec_id <> q.qid
    ),
    adc_topk AS (
      SELECT vec_id FROM scored
      ORDER BY adc_dist ASC NULLS LAST, vec_id LIMIT {_PQ_TOP_K}
    ),
    cand AS (
      SELECT vec_id FROM scored
      ORDER BY adc_dist ASC NULLS LAST, vec_id LIMIT {_PQ_RERANK}
    ),
    rerank AS (
      SELECT c.vec_id
      FROM cand c JOIN e USING (vec_id) CROSS JOIN q
      ORDER BY {dround_sql(
          f"list_sum(list_transform(range(1, {_DIM + 1}), i ->"
          " (e.ev[i] - q.qv[i]) * (e.ev[i] - q.qv[i])))", 6
      )} ASC NULLS LAST, c.vec_id
      LIMIT {_PQ_TOP_K}
    ),
    exact AS (
      SELECT e.vec_id
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.qid
      ORDER BY {dround_sql(
          f"list_sum(list_transform(range(1, {_DIM + 1}), i ->"
          " (e.ev[i] - q.qv[i]) * (e.ev[i] - q.qv[i])))", 6
      )} ASC NULLS LAST, e.vec_id
      LIMIT {_PQ_TOP_K}
    )
    SELECT q.qid,
           COUNT(*) AS exact_k,
           CAST(COUNT(a.vec_id) AS BIGINT) AS adc_hits,
           {dround_sql(f'COUNT(a.vec_id) / {_PQ_TOP_K}.0', 4)}
             AS adc_recall,
           CAST(COUNT(r.vec_id) AS BIGINT) AS rerank_hits,
           {dround_sql(f'COUNT(r.vec_id) / {_PQ_TOP_K}.0', 4)}
             AS rerank_recall
    FROM exact x
    LEFT JOIN adc_topk a USING (vec_id)
    LEFT JOIN rerank r USING (vec_id)
    CROSS JOIN q
    GROUP BY q.qid
    """,
    tags=("llm-similarity",),
)
@_scoped
def pq_adc_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search with exact re-rank, recall-
    evaluated -- the memory-bound production serving pattern the PQ
    codebook (pq_codebook_stats) exists for: encode the corpus once
    ({m} codes per vector), score a query against the {m} x {k} ADC
    lookup table instead of raw floats, take the top-{rr} candidates,
    re-rank just those with true L2, and report recall@{k_} of BOTH
    stages against exact brute force. The adc_recall/rerank_recall gap
    is the number that justifies two-stage serving: rescoring {rr}
    raw vectors recovers most of what 8-byte codes lose.

    Scale shape: codebook and query ride as LITERALS (a bounded
    {k}-row + 1-row materialization), so corpus encoding + ADC scoring
    is one joinless embarrassingly-parallel scan projecting {m} argmin
    structs and {m} constant-array lookups per row -- at 100 TB the
    scan reads 8-byte codes, not 256-byte vectors, which is the whole
    point of PQ. Both top-k heads are TakeOrderedAndProject over the
    ONE persisted encode output; the re-rank restricts the persisted
    truth frame by a <= {rr}-row broadcast; the final stitch joins
    three <= {k_}-row frames. Distances fold
    dimension-by-dimension left-to-right and snap to 6 decimals on
    both engines; argmin ties resolve by code id, ranking ties by
    vec_id (the pq_codebook_stats discipline end-to-end)."""
    return _finalize(spark, _pq_adc_recall_frame(spark, sf_dir))


def _pq_codebook_and_query(
    e: DataFrame,
) -> tuple[list[list[float]], int, list[float]]:
    """Bounded-setup collects shared by the flat-ADC and IVF-PQ ops:
    the md5-ranked {K}-row codebook plus the first-vec_id query row
    (the same <= 8-row materializations the r16 plan audit accepted as
    model artifacts, similarity.py pq_adc_topk_recall)."""
    cb_rows = (
        e.select(
            "vec_id",
            "v",
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(_PQ_K)
        .collect()
    )
    codebook = [list(r["v"]) for r in cb_rows]  # K x DIM doubles
    q_row = e.orderBy("vec_id").limit(1).collect()[0]
    return codebook, q_row["vec_id"], list(q_row["v"])


def _pq_adc_scored(
    e: DataFrame, codebook: list[list[float]], qv: list[float]
) -> DataFrame:
    """(vec_id, adc_dist) over an arbitrary (vec_id, v) frame: encode
    each row against the codebook LITERALS ({m} struct-argmins), score
    via the constant-folded query-to-codeword lookup table -- one
    joinless embarrassingly-parallel scan, shared by the flat scan
    (pq_adc_topk_recall) and the probed-lists scan
    (ann_ivfpq_topk_recall).

    r18 stage audit: the tree is built as ONE SQL string per
    projection (F.expr/selectExpr) instead of ~52k individual Column
    calls -- profiling showed the PQ family's ~9 s SCALING wall was
    DRIVER-side py4j round-trips constructing the literal expressions
    (execution of the encode scan itself is sub-second at 1x), so the
    fix is fewer gateway calls, not a different plan. The parsed tree
    is the same shape: same left-to-right subdistance folds, same
    array_min struct argmin with code-id tie-break, same element_at
    lookup. The query-to-codeword table is pre-folded in Python --
    bit-identical to the old F.lit arithmetic because Python floats
    are IEEE binary64 and the terms fold in the identical order
    Catalyst's constant folding evaluated them; literals are emitted
    as shortest-roundtrip reprs with the D suffix, which Java's
    correctly-rounded parser maps back to the same doubles."""

    def adc_const(s: int, c: int) -> float:
        # query-to-codeword subdistance, pre-folded (see docstring)
        base = s * _PQ_SUBDIM
        total = None
        for i in range(_PQ_SUBDIM):
            diff = qv[base + i] - codebook[c][base + i]
            term = diff * diff
            total = term if total is None else total + term
        return total

    def adc_lookup_sql(s: int) -> str:
        consts = ", ".join(_pq_dlit(adc_const(s, c)) for c in range(_PQ_K))
        return f"element_at(array({consts}), s{s}.c + 1)"

    return (
        e.selectExpr(
            "vec_id",
            *[f"{_pq_argmin_sql(codebook, s)} AS s{s}" for s in range(_PQ_M)],
        )
        .select(
            "vec_id",
            dround(
                F.expr(
                    " + ".join(adc_lookup_sql(s) for s in range(_PQ_M))
                ),
                6,
            ).alias("adc_dist"),
        )
    )


def _pq_adc_recall_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy ADC-recall frame (plan tests pin the joinless encode scan
    and bounded-broadcast stitches BEFORE the materialization idiom
    collapses them; the codebook/query collects are bounded setup).

    r18 stage audit (r17 VERDICT item 4): the op makes 4+ corpus
    passes (codebook/query setup, the encode scan under BOTH top-k
    heads, the true-distance scan under BOTH the exact-truth and
    re-rank branches). Three shared frames are now persisted once via
    the _pi_vectors discipline instead of re-derived per head: the
    repartitioned (vec_id, v) corpus (one parquet decode + one
    exchange serves every pass at full parallelism -- a single-file
    fixture would otherwise serialize each pass onto one task), the
    (vec_id, adc_dist) encode output (the literal-unrolled ADC
    expression runs ONCE, not once per head), and the (vec_id,
    true_dist) truth frame (exact top-k and re-rank are both heads
    over it; re-rank restricts it by the broadcast candidate set).
    Answers are bit-identical: every head orders the same snapped
    columns with the same tie-breaks, and dround/zip_with folds are
    partitioning-independent."""
    par = spark.sparkContext.defaultParallelism
    e = _persist(
        load_table(spark, sf_dir, "embeddings")
        .repartition(par, "vec_id")
        .select("vec_id", _dvec(F.col("embedding")).alias("v"))
    )
    codebook, qid, qv = _pq_codebook_and_query(e)

    scored = _persist(
        _pq_adc_scored(e.filter(F.col("vec_id") != F.lit(qid)), codebook, qv)
    )
    adc_topk = (
        scored.orderBy(F.col("adc_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_TOP_K)
        .select("vec_id", F.lit(1).alias("adc_hit"))
    )
    cand = (
        scored.orderBy(F.col("adc_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_RERANK)
        .select("vec_id")
    )
    qf = spark.createDataFrame([(qid, qv)], "qid long, qv array<double>")
    true_sq = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    truth = _persist(
        e.filter(F.col("vec_id") != F.lit(qid))
        .join(F.broadcast(qf))
        .select("vec_id", dround(true_sq, 6).alias("true_dist"))
    )
    rerank = (
        truth.join(F.broadcast(cand), "vec_id")
        .orderBy(F.col("true_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_TOP_K)
        .select("vec_id", F.lit(1).alias("rr_hit"))
    )
    exact = (
        truth.orderBy(F.col("true_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_TOP_K)
        .select("vec_id")
    )
    return (
        exact.join(F.broadcast(adc_topk), "vec_id", "left")
        .join(F.broadcast(rerank), "vec_id", "left")
        .withColumn("qid", F.lit(qid).cast("long"))
        .groupBy("qid")
        .agg(
            F.count("*").alias("exact_k"),
            F.count("adc_hit").cast("long").alias("adc_hits"),
            dround(
                F.count("adc_hit") / F.lit(float(_PQ_TOP_K)), 4
            ).alias("adc_recall"),
            F.count("rr_hit").cast("long").alias("rerank_hits"),
            dround(
                F.count("rr_hit") / F.lit(float(_PQ_TOP_K)), 4
            ).alias("rerank_recall"),
        )
    )


pq_adc_topk_recall.__doc__ = pq_adc_topk_recall.__doc__.format(
    m=_PQ_M, k=_PQ_K, rr=_PQ_RERANK, k_=_PQ_TOP_K
)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse-probe pruning + ADC scoring within probed lists + exact
# re-rank -- the FAISS IVFPQ / ScaNN production config (Jegou et al. §V).
# The two existing halves each price one loss: ann_ivf_topk prunes lists
# but scores raw floats; pq_adc_topk_recall scores 8-byte codes but scans
# EVERY row. At 100 TB neither is the deployed shape -- this op composes
# them and reports recall after BOTH losses plus the re-rank recovery.
# ---------------------------------------------------------------------------

_IVFPQ_PROBES = 2


@query(
    "ann_ivfpq_topk_recall",
    oracle=f"""
    WITH cent AS (
      SELECT label, i, {davg_sql('CAST(embedding[i] AS DOUBLE)')} AS cx
      FROM embeddings, LATERAL unnest(range(1, {_DIM} + 1)) AS t(i)
      GROUP BY label, i
    ),
    cvec AS (
      SELECT label, list(cx ORDER BY i) AS cv FROM cent GROUP BY label
    ),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings ORDER BY vec_id LIMIT 1),
    probe AS (
      SELECT cvec.label FROM cvec, q
      ORDER BY {_COS_SQL.format(a='cv', b='qv')} DESC NULLS LAST,
               cvec.label ASC NULLS LAST
      LIMIT {_IVFPQ_PROBES}
    ),
    ranked AS (
      SELECT CAST(embedding AS DOUBLE[]) AS cv,
             ROW_NUMBER() OVER (ORDER BY {_PQ_MD5}, vec_id) AS rn
      FROM embeddings
      QUALIFY rn <= {_PQ_K}
    ),
    cb AS (SELECT CAST(rn - 1 AS INT) AS code, cv FROM ranked),
    sub AS (SELECT CAST(s AS INT) AS subspace FROM range({_PQ_M}) t(s)),
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
          FROM embeddings),
    lists AS (
      SELECT e.vec_id, e.ev
      FROM e JOIN probe USING (label), q
      WHERE e.vec_id <> q.qid
    ),
    adc AS (
      SELECT sub.subspace, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}), i ->
               (q.qv[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
               * (q.qv[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
             )) AS d
      FROM sub, cb, q
    ),
    dist AS (
      SELECT l.vec_id, sub.subspace, cb.code,
             list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}), i ->
               (l.ev[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
               * (l.ev[subspace * {_PQ_SUBDIM} + i]
                  - cb.cv[subspace * {_PQ_SUBDIM} + i])
             )) AS sqdist
      FROM lists l, sub, cb
    ),
    best AS (
      SELECT vec_id, subspace, code
      FROM dist
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY sqdist, code) = 1
    ),
    piv AS (
      SELECT vec_id,
             MAX(CASE WHEN subspace = 0 THEN code END) AS c0,
             MAX(CASE WHEN subspace = 1 THEN code END) AS c1,
             MAX(CASE WHEN subspace = 2 THEN code END) AS c2,
             MAX(CASE WHEN subspace = 3 THEN code END) AS c3
      FROM best GROUP BY vec_id
    ),
    scored AS (
      SELECT p.vec_id,
             {dround_sql('a0.d + a1.d + a2.d + a3.d', 6)} AS adc_dist
      FROM piv p
      JOIN adc a0 ON a0.subspace = 0 AND a0.code = p.c0
      JOIN adc a1 ON a1.subspace = 1 AND a1.code = p.c1
      JOIN adc a2 ON a2.subspace = 2 AND a2.code = p.c2
      JOIN adc a3 ON a3.subspace = 3 AND a3.code = p.c3
    ),
    adc_topk AS (
      SELECT vec_id FROM scored
      ORDER BY adc_dist ASC NULLS LAST, vec_id LIMIT {_PQ_TOP_K}
    ),
    cand AS (
      SELECT vec_id FROM scored
      ORDER BY adc_dist ASC NULLS LAST, vec_id LIMIT {_PQ_RERANK}
    ),
    rerank AS (
      SELECT c.vec_id
      FROM cand c JOIN e USING (vec_id) CROSS JOIN q
      ORDER BY {dround_sql(
          f"list_sum(list_transform(range(1, {_DIM + 1}), i ->"
          " (e.ev[i] - q.qv[i]) * (e.ev[i] - q.qv[i])))", 6
      )} ASC NULLS LAST, c.vec_id
      LIMIT {_PQ_TOP_K}
    ),
    exact AS (
      SELECT e.vec_id
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.qid
      ORDER BY {dround_sql(
          f"list_sum(list_transform(range(1, {_DIM + 1}), i ->"
          " (e.ev[i] - q.qv[i]) * (e.ev[i] - q.qv[i])))", 6
      )} ASC NULLS LAST, e.vec_id
      LIMIT {_PQ_TOP_K}
    )
    SELECT q.qid,
           CAST((SELECT COUNT(*) FROM lists) AS BIGINT) AS scanned,
           COUNT(*) AS exact_k,
           CAST(COUNT(a.vec_id) AS BIGINT) AS adc_hits,
           {dround_sql(f'COUNT(a.vec_id) / {_PQ_TOP_K}.0', 4)}
             AS adc_recall,
           CAST(COUNT(r.vec_id) AS BIGINT) AS rerank_hits,
           {dround_sql(f'COUNT(r.vec_id) / {_PQ_TOP_K}.0', 4)}
             AS rerank_recall
    FROM exact x
    LEFT JOIN adc_topk a USING (vec_id)
    LEFT JOIN rerank r USING (vec_id)
    CROSS JOIN q
    GROUP BY q.qid
    """,
    tags=("llm-similarity",),
)
@_scoped
def ann_ivfpq_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search: probe the {p} per-label mean centroids nearest
    the query (ann_ivf_topk's coarse stage), ADC-score ONLY the probed
    lists' 8-byte codes (pq_adc_topk_recall's scoring stage), re-rank
    the top-{rr} candidates with true L2, and report recall@{k_} of
    both stages against GLOBAL exact brute force -- so the number
    prices coarse-pruning loss AND quantization loss together, which
    is the honest recall of the deployed FAISS-IVFPQ shape. `scanned`
    records how many rows the ADC stage actually touched (the pruning
    dividend: probed-lists rows, not the corpus).

    Scale shape: the centroid build is ONE shuffle reducing to labels
    x dims rows; the probe is a broadcast {p}-row frame, so list
    restriction is a map-side broadcast-hash-join semi-filter on the
    scan (at 100 TB the lists are partition keys and this is partition
    pruning); the ADC scan inherits the joinless constant-folded
    encode/score shape from _pq_adc_scored over ~{p}/L of the corpus;
    re-rank restricts the persisted truth frame by a <= {rr}-row
    broadcast.
    Distances snap to 6 decimals, argmin ties resolve by code id,
    rankings by vec_id (the PQ discipline end-to-end).

    Reference parity: the reference serves vector search from its OLAP
    engine's full-scan cosine (BLOG_POST_COMPLETE_WALKTHROUGH.md's
    analytics surface has no ANN index); this op is the Spark-first
    scale path for that same query class."""
    return _finalize(spark, _ivfpq_recall_frame(spark, sf_dir))


def _ivfpq_recall_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy IVF-PQ recall frame (plan tests pin the broadcast probe
    filter and the joinless ADC scan before _finalize collapses them).

    r18 stage audit (r17 VERDICT item 4): same shared-frame persists
    as _pq_adc_recall_frame -- the repartitioned corpus serves the
    setup collects, the centroid build, the probed-lists scan AND the
    truth scan from one parquet decode; the probed-lists ADC encode
    runs once for its THREE heads (adc top-k, re-rank candidates, the
    `scanned` count); the truth frame serves exact top-k and the
    broadcast-restricted re-rank."""
    from ..functions import davg

    par = spark.sparkContext.defaultParallelism
    e = _persist(
        load_table(spark, sf_dir, "embeddings")
        .repartition(par, "vec_id")
        .select("vec_id", "label", _dvec(F.col("embedding")).alias("v"))
    )
    ev = e.select("vec_id", "v")
    codebook, qid, qv = _pq_codebook_and_query(ev)

    cent = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(davg("x", "cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("cx")))
                ),
                lambda s: s.getField("cx"),
            ).alias("cv")
        )
    )
    qf = spark.createDataFrame([(qid, qv)], "qid long, qv array<double>")
    # Tie-break pinned cross-engine (r17 ADVICE): zero-norm centroids
    # rank NULL-last on BOTH sides (_cos here, _COS_SQL guard in the
    # oracle), and a NULL label ties after real labels (asc_nulls_last
    # here, explicit NULLS LAST in the oracle) -- Spark's ASC default
    # is NULLS FIRST, DuckDB's is NULLS LAST, so an unpinned label
    # tie-break would pick different probe lists per engine.
    probe = (
        cent.join(F.broadcast(qf))
        .select(F.col("label").alias("plabel"), _cos(F.col("cv"), F.col("qv")).alias("ccos"))
        .orderBy(F.col("ccos").desc(), F.col("plabel").asc_nulls_last())
        .limit(_IVFPQ_PROBES)
        .select("plabel")
    )
    lists = (
        e.join(F.broadcast(probe), e.label == F.col("plabel"))
        .filter(F.col("vec_id") != F.lit(qid))
        .select("vec_id", "v")
    )
    scored = _persist(_pq_adc_scored(lists, codebook, qv))
    adc_topk = (
        scored.orderBy(F.col("adc_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_TOP_K)
        .select("vec_id", F.lit(1).alias("adc_hit"))
    )
    cand = (
        scored.orderBy(F.col("adc_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_RERANK)
        .select("vec_id")
    )
    true_sq = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    truth = _persist(
        ev.filter(F.col("vec_id") != F.lit(qid))
        .join(F.broadcast(qf))
        .select("vec_id", dround(true_sq, 6).alias("true_dist"))
    )
    rerank = (
        truth.join(F.broadcast(cand), "vec_id")
        .orderBy(F.col("true_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_TOP_K)
        .select("vec_id", F.lit(1).alias("rr_hit"))
    )
    exact = (
        truth.orderBy(F.col("true_dist").asc_nulls_last(), "vec_id")
        .limit(_PQ_TOP_K)
        .select("vec_id")
    )
    scanned = scored.groupBy().agg(
        F.count("*").cast("long").alias("scanned")
    )
    return (
        exact.join(F.broadcast(adc_topk), "vec_id", "left")
        .join(F.broadcast(rerank), "vec_id", "left")
        .withColumn("qid", F.lit(qid).cast("long"))
        .groupBy("qid")
        .agg(
            F.count("*").alias("exact_k"),
            F.count("adc_hit").cast("long").alias("adc_hits"),
            dround(
                F.count("adc_hit") / F.lit(float(_PQ_TOP_K)), 4
            ).alias("adc_recall"),
            F.count("rr_hit").cast("long").alias("rerank_hits"),
            dround(
                F.count("rr_hit") / F.lit(float(_PQ_TOP_K)), 4
            ).alias("rerank_recall"),
        )
        .join(F.broadcast(scanned))
    )


ann_ivfpq_topk_recall.__doc__ = ann_ivfpq_topk_recall.__doc__.format(
    p=_IVFPQ_PROBES, rr=_PQ_RERANK, k_=_PQ_TOP_K
)
