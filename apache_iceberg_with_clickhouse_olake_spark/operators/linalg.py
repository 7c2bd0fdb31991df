"""Distributed iterative linear algebra over the ``embeddings`` table:
the power-iteration primitive toward the top principal component
(north-star LLM-pipeline surface; no reference counterpart -- the
whitening/decorrelation primitive of an embedding pipeline, and the
second HASH-EXACT iterative algorithm in the repo after the Lloyd
k-means in operators/clustering.py).

Engine-exactness follows the k-means recipe: every float that crosses
an iteration boundary is snapped (dround) or exactly decimal-summed
(dsum), so the DuckDB oracle -- the same iterations unrolled as CTEs --
pins values bit-for-bit:

- init: the constant unit vector (1/8, ..., 1/8) (64 * 0.125^2 = 1
  exactly);
- score: s_i = dround(dot(x_i, v), 6) per row (list_dot_product sums
  left-to-right exactly like Spark's zip_with/aggregate fold);
- accumulate: u_j = dsum_i(s_i * x_ij) -- exact decimal sum, so the
  reduction is partition-order-independent;
- normalize: v_j = dround(u_j / sqrt(dsum_j(u_j^2)), 4), the next
  iteration's input, bit-identical across engines.

Scale design (100 TB): per iteration the corpus is touched ONCE -- the
current vector rides a 1-row broadcast, each row computes its scalar
score in a projection, and the accumulation reduces to exactly dim
rows via posexplode + groupBy(dim) with map-side partial aggregation.
The normalization is a dim-row aggregate. Nothing driver-side, nothing
quadratic; the vector frame is persisted across iterations exactly like
the Lloyd loop (see _cache.py for the release discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dround, dround_sql, dsum, dsum_sql
from ..sources.parquet import load_table
from ._cache import scoped as _scoped
from ._cache import finalize as _finalize
from ._cache import persist_tracked as _persist
from .registry import query
from .similarity import _dvec

_DIM = 64
_PI_ITERS = 3
_V0 = 0.125  # 1/sqrt(64): exact in binary, unit norm by construction


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pi_frame(
    spark: SparkSession, sf_dir: str, iters: int = _PI_ITERS
) -> DataFrame:
    """Lazy (dim, component) frame after ``iters`` power iterations
    (plan tests can pin its physical shape before materialization; the
    Rayleigh-monotonicity test sweeps ``iters``)."""
    emb = _persist(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _dvec(F.col("embedding")).alias("dv")
        )
    )
    v = spark.range(_DIM).select(
        F.col("id").alias("dim"), F.lit(_V0).alias("c")
    )
    for _ in range(iters):
        varr = v.agg(
            F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("s")
        ).select(F.transform("s", lambda t: t["c"]).alias("varr"))
        s = emb.crossJoin(F.broadcast(varr)).select(
            "dv", dround(_dot(F.col("dv"), F.col("varr")), 6).alias("s")
        )
        u = (
            s.select("s", F.posexplode("dv").alias("dim", "x"))
            .groupBy("dim")
            .agg(dsum(F.col("x") * F.col("s"), "u"))
        )
        n2 = u.agg(dsum(F.col("u") * F.col("u"), "n2"))
        v = u.crossJoin(F.broadcast(n2)).select(
            "dim",
            dround(F.col("u") / F.sqrt(F.col("n2")), 4).alias("c"),
        )
    return v.select(
        # posexplode's position is INT; present as BIGINT like the oracle
        F.col("dim").cast("long").alias("dim"),
        F.col("c").alias("component"),
    ).orderBy("dim")


def _pi_sql() -> str:
    """The same _PI_ITERS iterations unrolled as DuckDB CTEs."""
    parts = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv"
        " FROM embeddings)",
        f"a0 AS (SELECT CAST(i - 1 AS BIGINT) AS dim, {_V0} AS c"
        f" FROM range(1, {_DIM} + 1) t(i))",
    ]
    for it in range(1, _PI_ITERS + 1):
        parts.append(
            f"va{it - 1} AS (SELECT list(c ORDER BY dim) AS varr"
            f" FROM a{it - 1})"
        )
        parts.append(
            f"s{it} AS (SELECT dv,"
            f" {dround_sql('list_dot_product(dv, varr)', 6)} AS s"
            f" FROM v CROSS JOIN va{it - 1})"
        )
        parts.append(
            f"u{it} AS (SELECT CAST(i - 1 AS BIGINT) AS dim,"
            f" {dsum_sql('s * dv[i]')} AS u"
            f" FROM s{it} CROSS JOIN range(1, {_DIM} + 1) t(i)"
            f" GROUP BY i)"
        )
        parts.append(f"n{it} AS (SELECT {dsum_sql('u * u')} AS n2 FROM u{it})")
        parts.append(
            f"a{it} AS (SELECT dim, {dround_sql('u / sqrt(n2)', 4)} AS c"
            f" FROM u{it} CROSS JOIN n{it})"
        )
    return "WITH " + ",\n".join(parts)


@query(
    "embedding_power_iteration",
    oracle=f"""
    {_pi_sql()}
    SELECT dim, c AS component FROM a{_PI_ITERS} ORDER BY dim
    """,
    tags=("llm-similarity", "llm-clustering"),
)
@_scoped
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The state of the power iteration toward the top principal
    direction of the (uncentered) embedding gram matrix after _PI_ITERS
    hash-exact iterations -- see module docstring for the snapping
    recipe and the one-corpus-pass-per-iteration scale shape. The
    oracle unrolls the identical iterations in SQL, so this ITERATIVE
    algorithm is value-hash-checked, not tolerance-checked.

    Honesty note: the synthetic embeddings fixture is near-isotropic
    (top eigen-gap ~1.07), so a small fixed iteration count is far from
    the converged eigenvector ON THIS DATA -- the op pins the PRIMITIVE
    (per-iteration plan, cross-engine exactness, Rayleigh-quotient
    monotonicity, asserted by tests/test_dsir_layout.py); a production
    run iterates the same per-iteration plan to convergence, where the
    cost is iterations x one corpus pass."""
    return _finalize(spark, _pi_frame(spark, sf_dir))
