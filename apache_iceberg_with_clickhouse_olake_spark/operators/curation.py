"""Flagship composite: the training-data curation pipeline.

Chains the LLM-pipeline stages end-to-end the way a real 100 TB corpus
build would -- quality filter -> exact dedup (keep first) -> join to the
multimodal asset catalog -> per-(media_type, lang) accounting -- all as
ONE declarative plan Catalyst optimizes globally (filter pushdown through
the window, payload column never read, media metadata derived in a
projection).

Scale shape: the only shuffles are the dedup window (keyed by content
fingerprint -- uniform) and the final low-cardinality rollup; the media
join is key-to-key on doc_id with no payload movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql, norm_text, norm_text_sql, tokens, tokens_sql
from ..sources.multimodal import MEDIA_SQL, gen_media
from ..sources.parquet import load_table
from .registry import query

_NORM = norm_text_sql("text")
_TOKS = tokens_sql("text")


@query(
    "curation_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, lang, text,
             len({_TOKS}) AS n_tokens,
             length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    ),
    kept AS (
      SELECT doc_id, lang, text, n_tokens FROM quality
      WHERE n_tokens >= 5 AND n_tokens <= 10000
        AND CAST(n_punct AS DOUBLE) / NULLIF(n_chars, 0) < 0.2
    ),
    deduped AS (
      SELECT doc_id, lang, n_tokens FROM kept
      QUALIFY row_number() OVER (
        PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
    )
    SELECT m.media_type, d.lang,
           COUNT(*) AS docs,
           {dsum_sql('d.n_tokens')} AS total_tokens,
           SUM(m.n_bytes) AS media_bytes
    FROM deduped d JOIN ({MEDIA_SQL}) m ON d.doc_id = m.doc_id
    GROUP BY m.media_type, d.lang
    ORDER BY m.media_type, d.lang
    """,
    tags=("llm-text", "llm-dedup", "multimodal"),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter -> exact-dedup -> media-metadata join -> rollup,
    as one plan. The media payload column is pruned (metadata only);
    the quality filter runs before the dedup shuffle so dropped docs
    never shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace("text", "[^.!?,;:]", ""))
    punct_ratio = n_punct.cast("double") / F.when(
        F.length("text") == 0, F.lit(None)
    ).otherwise(F.length("text"))
    kept = docs.filter(
        (n_tokens >= 5) & (n_tokens <= 10000) & (punct_ratio < 0.2)
    ).select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.md5(norm_text(F.col("text"))).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    media = gen_media(spark, sf_dir).select(
        "doc_id", "media_type", F.col("meta.n_bytes").alias("n_bytes")
    )
    return (
        deduped.join(media, "doc_id")
        .groupBy("media_type", "lang")
        .agg(
            F.count("*").alias("docs"),
            dsum("n_tokens", "total_tokens"),
            F.sum("n_bytes").alias("media_bytes"),
        )
        .orderBy("media_type", "lang")
    )
