"""Deterministic multimodal (image/audio/video) asset table.

The engine treats media as OPAQUE ``binary`` payload columns plus a typed
metadata struct -- the lakehouse-native multimodal layout (the reference
has no media surface; this is north-star extension, SURVEY.md §7). Since
no media libraries ship in this container, payload bytes are a
deterministic md5 chain keyed by ``doc_id``: real bytes, real sizes, and
-- because md5/unhex/repeat exist identically in DuckDB -- the whole
generator sits under the correctness gate, metadata and payload alike.

Scale design: one media row per document; payloads are generated
per-row with no shuffle (pure projection over the documents scan), so
the table inherits the documents table's partitioning at any scale.
Decode-stage operators (operators/multimodal.py) prune to the payload +
key columns only and filter by media_type BEFORE the Arrow transfer, so
at 100 TB the bytes that cross into Python are exactly the bytes the
operator needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_int60, md5_int60_sql
from .parquet import load_table

MEDIA_TYPES = ("image", "audio", "video")
FORMATS = {"image": ("png", "jpeg"), "audio": ("wav", "flac"),
           "video": ("mp4", "webm")}
FRAME_STEP = 5  # video frame-sampling stride (every 5th frame)
CHUNK_BYTES = 64  # audio energy-window size


def _h(salt: str) -> F.Column:
    return md5_int60(
        F.concat(F.lit(f"{salt}-"), F.col("doc_id").cast("string"))
    )


def gen_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One media asset per document: payload binary + typed metadata.

    Deterministic pure function of doc_id (md5 arithmetic shared with the
    DuckDB twin MEDIA_SQL):
    - media_type  = [image,audio,video][h % 3]
    - format      = per-type pick by h2 % 2
    - payload     = unhex(repeat(md5('payload-'||doc_id), 8 + h2 % 25))
                    -> 128..512 real bytes
    - width/height (image), n_frames (video), sample_rate/duration (audio)
      all h2-derived so every field is oracle-checkable.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base = docs.select(
        "doc_id", _h("media").alias("h"), _h("meta").alias("h2")
    ).select(
        "doc_id",
        "h",
        "h2",
        (F.lit(8) + F.col("h2") % 25).cast("int").alias("k_repeat"),
    )
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("h") % 3 + 1).cast("int")
    )
    fmt = F.element_at(
        F.array(
            *[F.lit(f) for t in MEDIA_TYPES for f in FORMATS[t]]
        ),
        ((F.col("h") % 3) * 2 + F.col("h2") % 2 + 1).cast("int"),
    )
    hex_col = F.expr(
        "repeat(md5(concat('payload-', CAST(doc_id AS STRING))), k_repeat)"
    )
    typed = base.select(
        "doc_id",
        "h2",
        media_type.alias("media_type"),
        fmt.alias("format"),
        F.unhex(hex_col).alias("payload"),
        (F.col("k_repeat") * 16).alias("n_bytes"),
    )
    is_img = F.col("media_type") == "image"
    is_aud = F.col("media_type") == "audio"
    is_vid = F.col("media_type") == "video"
    return typed.select(
        "doc_id",
        "media_type",
        "format",
        "payload",
        F.struct(
            F.col("n_bytes").cast("int").alias("n_bytes"),
            F.when(is_img, (16 * (F.col("h2") % 16 + 1)).cast("int"))
            .otherwise(F.lit(0)).alias("width"),
            F.when(is_img, (16 * (F.expr("h2 div 16") % 16 + 1)).cast("int"))
            .otherwise(F.lit(0)).alias("height"),
            F.when(is_vid, (F.lit(8) + F.col("h2") % 25).cast("int"))
            .when(is_img, F.lit(1)).otherwise(F.lit(0)).alias("n_frames"),
            F.when(
                is_aud,
                F.element_at(
                    F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100)),
                    (F.col("h2") % 4 + 1).cast("int"),
                ),
            ).otherwise(F.lit(0)).alias("sample_rate"),
            F.when(is_aud | is_vid, (F.lit(500) + F.col("h2") % 60000).cast("int"))
            .otherwise(F.lit(0)).alias("duration_ms"),
        ).alias("meta"),
    )


def _h_sql(salt: str) -> str:
    return md5_int60_sql(f"concat('{salt}-', CAST(doc_id AS VARCHAR))")


# DuckDB twin: same rows, with `hex` (the payload's hex string) in place of
# the binary column so oracles can do byte arithmetic via substr.
MEDIA_SQL = f"""
    SELECT doc_id,
           ['image','audio','video'][CAST(h % 3 + 1 AS INT)] AS media_type,
           ['png','jpeg','wav','flac','mp4','webm']
             [CAST((h % 3) * 2 + h2 % 2 + 1 AS INT)] AS format,
           repeat(md5(concat('payload-', CAST(doc_id AS VARCHAR))),
                  CAST(8 + h2 % 25 AS INT)) AS hex,
           CAST((8 + h2 % 25) * 16 AS INT) AS n_bytes,
           CASE WHEN h % 3 = 0 THEN CAST(16 * (h2 % 16 + 1) AS INT)
                ELSE 0 END AS width,
           CASE WHEN h % 3 = 0 THEN CAST(16 * ((h2 // 16) % 16 + 1) AS INT)
                ELSE 0 END AS height,
           CASE WHEN h % 3 = 2 THEN CAST(8 + h2 % 25 AS INT)
                WHEN h % 3 = 0 THEN 1 ELSE 0 END AS n_frames,
           CASE WHEN h % 3 = 1
                THEN [8000,16000,22050,44100][CAST(h2 % 4 + 1 AS INT)]
                ELSE 0 END AS sample_rate,
           CASE WHEN h % 3 >= 1 THEN CAST(500 + h2 % 60000 AS INT)
                ELSE 0 END AS duration_ms
    FROM (SELECT doc_id,
                 {_h_sql('media')} AS h,
                 {_h_sql('meta')} AS h2
          FROM documents)
"""
