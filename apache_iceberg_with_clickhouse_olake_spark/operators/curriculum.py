"""Curriculum ordering: difficulty binning and the phase schedule a
length-based curriculum (the classic easy-to-hard baseline) derives
from it.

The training-order family the pipeline was missing: the sampling ops
decide WHAT to keep (mixture weights, epoch caps, coresets), these two
decide WHEN each slice is served. Difficulty proxy is token count --
the one every published length-curriculum baseline uses and the only
one derivable engine-exactly from the shared whitespace tokenizer;
word-length and token-mass statistics ride along per bin so a recipe
owner can judge whether the proxy orders anything real.

Engine-exactness: bin cut points are EXACT continuous quartiles
(Spark ``percentile`` == DuckDB ``quantile_cont``, the same
linear-interpolation definition already relied on by
analytics.order_value_percentiles), snapped to 6 decimals on both
sides before the CASE binning; all derived ratios snap through
dround/davg as everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    davg,
    davg_sql,
    dround,
    dround_sql,
    tokens,
    tokens_sql,
)
from ..sources.parquet import load_table
from .registry import query

_TOKS = tokens_sql("text")

# quartile grid for the difficulty bins (bin 0 = empty docs)
_CURR_QS = (0.25, 0.5, 0.75)
# equal per-phase token budgets over _N_PHASES progressive phases
_N_PHASES = 4


def _sized_sql() -> str:
    """(doc_id, n_toks, chars) per document -- the one tokenize pass
    both ops share (chars = total token characters, for the per-bin
    mean word length)."""
    return (
        "sized AS ("
        f" SELECT doc_id, len({_TOKS}) AS n_toks,"
        f" COALESCE(list_sum(list_transform({_TOKS}, t -> len(t))), 0)"
        " AS chars"
        " FROM documents)"
    )


_CUTS_SQL = (
    "cuts AS (SELECT "
    + ", ".join(
        f"{dround_sql(f'quantile_cont(n_toks, {p})', 6)} AS c{i + 1}"
        for i, p in enumerate(_CURR_QS)
    )
    + " FROM sized WHERE n_toks > 0)"
)

_BINNED_SQL = (
    "binned AS (SELECT s.*,"
    " CASE WHEN s.n_toks = 0 THEN 0"
    " WHEN s.n_toks <= c.c1 THEN 1"
    " WHEN s.n_toks <= c.c2 THEN 2"
    " WHEN s.n_toks <= c.c3 THEN 3"
    " ELSE 4 END AS bin"
    " FROM sized s CROSS JOIN cuts c)"
)


@query(
    "curriculum_difficulty_bins",
    oracle=f"""
    WITH {_sized_sql()},
    {_CUTS_SQL},
    {_BINNED_SQL}
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_toks) AS BIGINT) AS min_toks,
           CAST(MAX(n_toks) AS BIGINT) AS max_toks,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           {davg_sql(
               'CASE WHEN n_toks = 0 THEN NULL'
               ' ELSE chars / CAST(n_toks AS DOUBLE) END'
           )} AS avg_word_len,
           {dround_sql(
               'SUM(n_toks) / NULLIF(CAST(SUM(SUM(n_toks)) OVER ()'
               ' AS DOUBLE), 0.0)', 6
           )} AS token_share
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    tags=("llm-text", "llm-sampling"),
)
def curriculum_difficulty_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-curriculum difficulty bins: exact token-count quartiles
    over the non-empty corpus cut the documents into four difficulty
    bins (bin 0 holds empty docs), and each bin reports its size,
    difficulty range, token mass, mean word length, and share of the
    corpus token budget -- the table a curriculum designer reads to
    decide whether length even separates the corpus before wiring an
    easy-to-hard schedule (near-equal per-bin word lengths and token
    shares mean the proxy orders nothing and a curriculum would be
    noise).

    Shape at scale: ONE corpus tokenize pass produces (n_toks, chars)
    per doc; the quartile cut points are a single exact-percentile
    aggregation (sort-based partial agg, 3 doubles out) broadcast back
    for a map-side CASE binning; the rollup has 5 groups. No window
    touches per-doc rows -- the only OVER () runs on the 5-row
    bin frame."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sized = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.coalesce(
            F.aggregate(
                F.transform(toks, F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
            F.lit(0),
        ).cast("long").alias("chars"),
    )
    cuts = sized.filter(F.col("n_toks") > 0).agg(
        *[
            dround(
                F.percentile(F.col("n_toks"), F.lit(p)), 6
            ).alias(f"c{i + 1}")
            for i, p in enumerate(_CURR_QS)
        ]
    )
    binned = sized.crossJoin(F.broadcast(cuts)).withColumn(
        "bin",
        F.when(F.col("n_toks") == 0, F.lit(0))
        .when(F.col("n_toks") <= F.col("c1"), F.lit(1))
        .when(F.col("n_toks") <= F.col("c2"), F.lit(2))
        .when(F.col("n_toks") <= F.col("c3"), F.lit(3))
        .otherwise(F.lit(4))
        .cast("int"),
    )
    w_all = Window.partitionBy()
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_toks").cast("long").alias("min_toks"),
        F.max("n_toks").cast("long").alias("max_toks"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        davg(
            F.when(
                F.col("n_toks") == 0, F.lit(None).cast("double")
            ).otherwise(
                F.col("chars") / F.col("n_toks").cast("double")
            ),
            "avg_word_len",
        ),
    )
    return (
        per.select(
            "bin",
            "n_docs",
            "min_toks",
            "max_toks",
            "total_tokens",
            "avg_word_len",
            dround(
                F.col("total_tokens")
                / F.nullif(
                    F.sum("total_tokens").over(w_all).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("token_share"),
        )
        .orderBy("bin")
    )


@query(
    "curriculum_phase_plan",
    oracle=f"""
    WITH {_sized_sql()},
    {_CUTS_SQL},
    {_BINNED_SQL},
    per_bin AS (
      SELECT bin, SUM(n_toks) AS toks FROM binned
      WHERE bin > 0 GROUP BY bin
    ),
    total AS (SELECT CAST(SUM(toks) AS DOUBLE) AS t FROM per_bin),
    phases AS (
      SELECT CAST(p AS INT) AS phase
      FROM range(1, {_N_PHASES + 1}) r(p)
    ),
    avail AS (
      SELECT ph.phase,
             CAST(COALESCE(SUM(b.toks), 0) AS BIGINT)
               AS available_tokens
      FROM phases ph
      LEFT JOIN per_bin b ON b.bin <= ph.phase
      GROUP BY ph.phase
    )
    SELECT a.phase,
           a.phase AS bins_included,
           a.available_tokens,
           {dround_sql(f'total.t / {_N_PHASES}', 2)} AS phase_budget,
           {dround_sql(
               f'(total.t / {_N_PHASES})'
               ' / NULLIF(CAST(a.available_tokens AS DOUBLE), 0.0)', 4
           )} AS epochs_over_available,
           CAST(
             (total.t / {_N_PHASES})
               <= CAST(a.available_tokens AS DOUBLE)
             AS BOOLEAN
           ) AS budget_fits
    FROM avail a CROSS JOIN total
    ORDER BY a.phase
    """,
    tags=("llm-sampling",),
)
def curriculum_phase_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schedule the bins imply: phase p (of {n}) trains on
    difficulty bins 1..p (progressive widening -- the standard
    length-curriculum recipe) with an equal quarter of the corpus
    token budget. Per phase: the unique tokens available to it, its
    budget, the repeat factor the budget forces on that slice
    (epochs_over_available -- early phases re-read the easy slice),
    and whether the budget fits without repeats. Phase 1 showing a 3x
    repeat of the easiest quartile is the overfit warning this table
    surfaces before any run.

    Shape at scale: everything after the shared tokenize pass and the
    3-double percentile agg operates on a <= {n}-row frame (the bin
    rollup joined to a literal phase grid); empty docs (bin 0) are
    excluded from both the budget and availability."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sized = docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_toks")
    )
    cuts = sized.filter(F.col("n_toks") > 0).agg(
        *[
            dround(
                F.percentile(F.col("n_toks"), F.lit(p)), 6
            ).alias(f"c{i + 1}")
            for i, p in enumerate(_CURR_QS)
        ]
    )
    binned = sized.crossJoin(F.broadcast(cuts)).withColumn(
        "bin",
        F.when(F.col("n_toks") == 0, F.lit(0))
        .when(F.col("n_toks") <= F.col("c1"), F.lit(1))
        .when(F.col("n_toks") <= F.col("c2"), F.lit(2))
        .when(F.col("n_toks") <= F.col("c3"), F.lit(3))
        .otherwise(F.lit(4))
        .cast("int"),
    )
    per_bin = (
        binned.filter(F.col("bin") > 0)
        .groupBy("bin")
        .agg(F.sum("n_toks").alias("toks"))
    )
    phases = spark.range(1, _N_PHASES + 1).select(
        F.col("id").cast("int").alias("phase")
    )
    avail = (
        phases.join(
            F.broadcast(per_bin), per_bin["bin"] <= phases["phase"], "left"
        )
        .groupBy("phase")
        .agg(
            F.coalesce(F.sum("toks"), F.lit(0))
            .cast("long")
            .alias("available_tokens")
        )
    )
    total = per_bin.agg(
        F.sum("toks").cast("double").alias("t")
    )
    budget = F.col("t") / F.lit(float(_N_PHASES))
    return (
        avail.crossJoin(F.broadcast(total))
        .select(
            "phase",
            F.col("phase").alias("bins_included"),
            "available_tokens",
            dround(budget, 2).alias("phase_budget"),
            dround(
                budget
                / F.nullif(
                    F.col("available_tokens").cast("double"), F.lit(0.0)
                ),
                4,
            ).alias("epochs_over_available"),
            (budget <= F.col("available_tokens").cast("double")).alias(
                "budget_fits"
            ),
        )
        .orderBy("phase")
    )


curriculum_phase_plan.__doc__ = curriculum_phase_plan.__doc__.format(
    n=_N_PHASES
)
