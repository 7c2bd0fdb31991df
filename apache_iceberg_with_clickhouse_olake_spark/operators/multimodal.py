"""Multimodal-column operators: decode, feature-extract, frame-sample,
resize over opaque ``binary`` media payloads (north-star extension;
the reference has no media surface).

The registered queries use a DETERMINISTIC FAKE decode: payload bytes
are interpreted directly as pixel/sample values (``numpy.frombuffer``),
so the DuckDB oracle can re-derive every byte. The REAL decode path is
:func:`decode_with_codec` (PIL for images, soundfile for audio --
returns the same flat-uint8 value domain) with
:func:`media_decode_features_real` as its ``mapInPandas`` twin; the
container ships no codec libraries, so that branch is covered by the
``pytest.importorskip``-gated ``tests/test_multimodal_real_codec.py``
(runs the moment pillow appears) rather than the driver oracle gate.
Everything Spark-side -- schema, metadata pushdown, column pruning,
Arrow batch shape, ``mapInPandas`` signatures -- is shared between the
two paths and oracle-/pytest-verified on the fake one.

Scale design (100 TB):
- Metadata predicates (``media_type = 'video'``) and column pruning happen
  BEFORE ``mapInPandas``: Catalyst pushes them into the parquet scan, so
  only the needed payload bytes ever cross the Arrow boundary.
- All decode work is per-row (no shuffle); output rows are a pure function
  of the input row, so the stage pipelines with the scan and parallelism
  equals input splits.
- Aggregates after decode are ordinary map-side-combine groupBys on
  low-cardinality keys.

Because payloads are md5-hex chains, DuckDB re-derives every byte with
``substr(hex, 2i-1, 2)`` arithmetic -- the pandas decode path is checked
value-for-value against SQL, not just row counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg_sql
from ..sources.multimodal import CHUNK_BYTES, FRAME_STEP, MEDIA_SQL, gen_media
from .registry import query

# DuckDB list of byte values of hex[off+1 .. off+n] (1-based hex offsets).
def _bytes_sql(hex_expr: str, start: str, n: str) -> str:
    return (
        f"list_transform(range(1, ({n}) + 1), bi -> "
        f"CAST(concat('0x', substr({hex_expr}, ({start}) * 2 + bi * 2 - 1, 2))"
        f" AS INT))"
    )


_IMAGE_FORMATS = frozenset({"png", "jpeg", "jpg", "gif", "bmp", "webp"})
_AUDIO_FORMATS = frozenset({"wav", "flac", "ogg"})


def decode_with_codec(payload: bytes, fmt: str) -> np.ndarray:
    """Real codec decode for deployments that ship media libraries.

    Returns the decoded asset as a FLAT uint8 array -- the same value
    domain the deterministic fake decode produces -- so every downstream
    feature operator (byte stats, frame slicing, chunk energy) applies
    to real assets unchanged:

    - image formats: PIL ``Image.open`` -> pixel array (H, W[, C])
      flattened in C order;
    - audio formats: ``soundfile.read`` -> PCM16 samples viewed as
      little-endian bytes (2 bytes/sample, interleaved channels).

    Raises ``NotImplementedError`` when the library for the requested
    format is absent (this container ships neither pillow nor
    soundfile; ``tests/test_multimodal_real_codec.py`` gates on
    ``pytest.importorskip`` and runs the moment pillow appears).
    """
    fmt = fmt.lower().lstrip(".")
    if fmt in _IMAGE_FORMATS:
        try:
            import io

            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                f"format={fmt!r} needs pillow; container ships no codecs"
            )
        with Image.open(io.BytesIO(payload)) as img:
            # Canonicalize to an 8-bit mode BEFORE the uint8 view: a
            # direct np.asarray(dtype=uint8) on 16-bit ('I;16'), 1-bit
            # ('1') or palette ('P') images silently truncates / casts
            # instead of decoding into the documented flat-uint8 pixel
            # domain (r6 ADVICE). Palette/1-bit/color modes expand via
            # convert; 16-bit grayscale scales down explicitly (high
            # byte -- PIL's own I;16->L convert CLIPS to 255 instead of
            # scaling, so convert() is wrong for it); 32-bit 'I' and
            # float 'F' have no defined uint8 mapping without knowing
            # the data range, so they raise rather than clip silently.
            if img.mode in ("I;16", "I;16B", "I;16L", "I;16N"):
                arr = np.asarray(img, dtype=np.uint32)
                return (arr >> 8).astype(np.uint8).reshape(-1)
            if img.mode in ("I", "F"):
                raise NotImplementedError(
                    f"image mode {img.mode!r} has no canonical uint8 "
                    "scaling (unbounded range); decode not supported"
                )
            if img.mode not in ("L", "RGB", "RGBA", "LA"):
                img = img.convert("L" if img.mode == "1" else "RGB")
            return np.asarray(img, dtype=np.uint8).reshape(-1)
    if fmt in _AUDIO_FORMATS:
        try:
            import io

            import soundfile
        except ImportError:
            raise NotImplementedError(
                f"format={fmt!r} needs soundfile; container ships no codecs"
            )
        samples, _rate = soundfile.read(io.BytesIO(payload), dtype="int16")
        return np.ascontiguousarray(samples, dtype="<i2").view(np.uint8)
    raise NotImplementedError(
        f"no codec wired for format={fmt!r} "
        f"(images: {sorted(_IMAGE_FORMATS)}, audio: {sorted(_AUDIO_FORMATS)})"
    )


# ---------------------------------------------------------------------------
# Catalog stats (metadata-only: payload column pruned from the scan)
# ---------------------------------------------------------------------------

@query(
    "media_catalog_stats",
    oracle=f"""
    SELECT media_type, format,
           COUNT(*) AS assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           MAX(width) AS max_width,
           MAX(height) AS max_height,
           {davg_sql('duration_ms')} AS avg_duration_ms
    FROM ({MEDIA_SQL})
    GROUP BY media_type, format
    ORDER BY media_type, format
    """,
    tags=("multimodal",),
)
def media_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type/format asset accounting off the typed metadata struct only
    -- the payload column never leaves the scan (column pruning)."""
    from ..functions import davg

    media = gen_media(spark, sf_dir)
    return (
        media.select(
            "media_type",
            "format",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        )
        .groupBy("media_type", "format")
        .agg(
            F.count("*").alias("assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            davg("duration_ms", "avg_duration_ms"),
        )
        .orderBy("media_type", "format")
    )


# ---------------------------------------------------------------------------
# Generic decode + feature extraction (mapInPandas over Arrow batches)
# ---------------------------------------------------------------------------

_FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "byte_mean double, byte_min int, byte_max int"
)


def _features_frame(pdf, arrs) -> pd.DataFrame:
    """Per-asset byte statistics over decoded uint8 arrays -- shared by
    the fake-decode and real-codec paths so both emit _FEATURES_SCHEMA
    and the same oracle shape applies to either."""
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": [a.size for a in arrs],
            # exact int sum / count: bit-identical to SQL division
            "byte_mean": [float(int(a.sum()) / a.size) for a in arrs],
            "byte_min": [int(a.min()) for a in arrs],
            "byte_max": [int(a.max()) for a in arrs],
        }
    )


def _decode_features_batches(batches):
    """Vectorized fake-decode: payload bytes -> per-asset byte statistics.
    Iterator-of-DataFrames in/out == one Arrow batch per yield."""
    for pdf in batches:
        arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
        yield _features_frame(pdf, arrs)


def _decode_features_batches_real(batches):
    """Real-codec twin of :func:`_decode_features_batches`: decodes each
    payload with :func:`decode_with_codec` (PIL/soundfile) instead of
    interpreting raw bytes. Same Arrow batch shape, same output schema,
    same per-row independence -- the Spark plan is identical."""
    for pdf in batches:
        arrs = [
            decode_with_codec(p, f)
            for p, f in zip(pdf["payload"], pdf["format"])
        ]
        yield _features_frame(pdf, arrs)


def media_decode_features_real(media: DataFrame) -> DataFrame:
    """Real-codec feature extraction over a media DataFrame carrying
    ``doc_id, media_type, format, payload``. Not a registered query: the
    sandbox ships no codec libraries, so the driver gate cannot
    oracle-check it -- the importorskip-gated test in
    ``tests/test_multimodal_real_codec.py`` exercises it instead."""
    return media.select(
        "doc_id", "media_type", "format", "payload"
    ).mapInPandas(_decode_features_batches_real, _FEATURES_SCHEMA)


@query(
    "media_decode_features",
    oracle=f"""
    SELECT doc_id, media_type, n_bytes,
           CAST(list_sum(bytes) AS DOUBLE) / n_bytes AS byte_mean,
           list_min(bytes) AS byte_min,
           list_max(bytes) AS byte_max
    FROM (
      SELECT doc_id, media_type, n_bytes,
             {_bytes_sql('hex', '0', 'n_bytes')} AS bytes
      FROM ({MEDIA_SQL})
    )
    """,
    tags=("multimodal",),
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract for every asset via ``mapInPandas``: numpy
    over raw payload bytes, one output row per asset. The oracle re-derives
    each byte from the hex chain in SQL, so the Python path is checked
    value-for-value."""
    media = gen_media(spark, sf_dir).select("doc_id", "media_type", "payload")
    return media.mapInPandas(_decode_features_batches, _FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Video frame sampling (explode k-th frames; 1 row in -> ~n_frames/k out)
# ---------------------------------------------------------------------------

_FRAMES_SCHEMA = (
    "doc_id long, frame_index int, frame_len int, frame_mean double"
)


def _frame_sample_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "frame_index": [], "frame_len": [],
               "frame_mean": []}
        for doc_id, payload, n_frames in zip(
            pdf["doc_id"], pdf["payload"], pdf["n_frames"]
        ):
            arr = np.frombuffer(payload, dtype=np.uint8)
            fs = arr.size // int(n_frames)
            for i in range(0, int(n_frames), FRAME_STEP):
                frame = arr[i * fs:(i + 1) * fs]
                out["doc_id"].append(doc_id)
                out["frame_index"].append(i)
                out["frame_len"].append(frame.size)
                out["frame_mean"].append(float(int(frame.sum()) / frame.size))
        yield pd.DataFrame(out)


@query(
    "video_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, hex, n_bytes, n_frames, n_bytes // n_frames AS fs
      FROM ({MEDIA_SQL}) WHERE media_type = 'video'
    )
    SELECT doc_id,
           CAST(i AS INT) AS frame_index,
           CAST(fs AS INT) AS frame_len,
           CAST(list_sum(fb) AS DOUBLE) / fs AS frame_mean
    FROM (
      SELECT doc_id, fs, i,
             {_bytes_sql('hex', 'i * fs', 'fs')} AS fb
      FROM v, LATERAL unnest(range(0, n_frames, {FRAME_STEP})) AS t(i)
    )
    """,
    tags=("multimodal",),
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every FRAME_STEP-th (5th) frame of each video
    payload becomes its own row (frame bytes = contiguous payload slice).
    The media_type filter prunes to videos BEFORE the Arrow transfer."""
    media = (
        gen_media(spark, sf_dir)
        .filter(F.col("media_type") == "video")
        .select("doc_id", "payload", F.col("meta.n_frames").alias("n_frames"))
    )
    return media.mapInPandas(_frame_sample_batches, _FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Audio chunk energy (fixed windows over samples)
# ---------------------------------------------------------------------------

_ENERGY_SCHEMA = "doc_id long, chunk int, energy double"


def _chunk_energy_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "chunk": [], "energy": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            for j in range(arr.size // CHUNK_BYTES):
                w = arr[j * CHUNK_BYTES:(j + 1) * CHUNK_BYTES]
                out["doc_id"].append(doc_id)
                out["chunk"].append(j)
                out["energy"].append(float(int((w * w).sum()) / CHUNK_BYTES))
        yield pd.DataFrame(out)


@query(
    "audio_chunk_energy",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, hex, n_bytes FROM ({MEDIA_SQL})
      WHERE media_type = 'audio'
    )
    SELECT doc_id,
           CAST(j AS INT) AS chunk,
           CAST(list_sum(list_transform(cb, x -> x * x)) AS DOUBLE)
             / {CHUNK_BYTES} AS energy
    FROM (
      SELECT doc_id, j,
             {_bytes_sql('hex', f'j * {CHUNK_BYTES}', str(CHUNK_BYTES))} AS cb
      FROM a, LATERAL unnest(range(0, n_bytes // {CHUNK_BYTES})) AS t(j)
    )
    """,
    tags=("multimodal",),
)
def audio_chunk_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: mean-square energy per CHUNK_BYTES (64)
    byte window of each audio payload (samples = raw bytes under the fake
    decode)."""
    media = (
        gen_media(spark, sf_dir)
        .filter(F.col("media_type") == "audio")
        .select("doc_id", "payload")
    )
    return media.mapInPandas(_chunk_energy_batches, _ENERGY_SCHEMA)


# ---------------------------------------------------------------------------
# Image resize (block-average to 8x8 thumbnail; rows-only + pytest oracle)
# ---------------------------------------------------------------------------

_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "px_mean double, px_checksum double"
)
_OUT_DIM = 8


def _resize_batches(batches):
    for pdf in batches:
        out = {k: [] for k in
               ("doc_id", "width", "height", "out_w", "out_h",
                "px_mean", "px_checksum")}
        for doc_id, payload, w, h in zip(
            pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
        ):
            arr = np.frombuffer(payload, dtype=np.uint8)
            w, h = int(w), int(h)
            # fake decode: pixel(r, c) = payload[(r*w + c) % n_bytes]
            px = arr[(np.arange(h * w) % arr.size)].reshape(h, w)
            # width/height are multiples of 16 -> divisible by 8: exact
            # block-average pooling (small itself is pinned by pytest's
            # numpy reference; the emitted checksum uses the closed form
            # sum(block_means) == total/(bh*bw) so the SQL oracle can
            # reproduce it bit-for-bit without materializing pixels)
            bh, bw = h // _OUT_DIM, w // _OUT_DIM
            total = int(px.sum())
            checksum = total / (bh * bw)
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["out_w"].append(_OUT_DIM)
            out["out_h"].append(_OUT_DIM)
            out["px_mean"].append(checksum / (_OUT_DIM * _OUT_DIM))
            out["px_checksum"].append(checksum)
        yield pd.DataFrame(out)


@query(
    "image_resize_thumbnail",
    oracle=f"""
    WITH img AS (
      SELECT doc_id, width, height, n_bytes,
             width * height AS hw,
             (width // {_OUT_DIM}) * (height // {_OUT_DIM}) AS block_px,
             {_bytes_sql('hex', '0', 'n_bytes')} AS bytes
      FROM ({MEDIA_SQL}) WHERE media_type = 'image'
    ),
    sums AS (
      SELECT doc_id, width, height, block_px,
             -- pixel(i) = byte[i % n]: full byte-array repeats + prefix
             list_sum(bytes) * (hw // n_bytes)
               + COALESCE(list_sum(bytes[1:(hw % n_bytes)]), 0) AS total
      FROM img
    )
    SELECT doc_id, width, height,
           CAST({_OUT_DIM} AS INT) AS out_w,
           CAST({_OUT_DIM} AS INT) AS out_h,
           CAST(total AS DOUBLE) / block_px / {_OUT_DIM * _OUT_DIM}
             AS px_mean,
           CAST(total AS DOUBLE) / block_px AS px_checksum
    FROM sums
    """,
    tags=("multimodal",),
)
def image_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8x8 block-average thumbnail of every image (fake pixel decode over
    payload bytes). The emitted checksum/mean use the closed form
    sum(block_means) = total_pixel_sum/(block_px), which the SQL oracle
    reproduces bit-for-bit; the per-block pooled values themselves are
    pinned by pytest's independent numpy reference."""
    media = (
        gen_media(spark, sf_dir)
        .filter(F.col("media_type") == "image")
        .select(
            "doc_id",
            "payload",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        )
    )
    return media.mapInPandas(_resize_batches, _RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Decoded-feature rollup (decode -> groupBy: the curation-pipeline shape)
# ---------------------------------------------------------------------------

@query(
    "media_features_by_type",
    oracle=f"""
    SELECT media_type,
           COUNT(*) AS assets,
           {davg_sql('byte_mean')} AS avg_byte_mean,
           MIN(byte_min) AS global_min,
           MAX(byte_max) AS global_max
    FROM (
      SELECT doc_id, media_type, n_bytes,
             CAST(list_sum(bytes) AS DOUBLE) / n_bytes AS byte_mean,
             list_min(bytes) AS byte_min,
             list_max(bytes) AS byte_max
      FROM (
        SELECT doc_id, media_type, n_bytes,
               {_bytes_sql('hex', '0', 'n_bytes')} AS bytes
        FROM ({MEDIA_SQL})
      )
    )
    GROUP BY media_type
    ORDER BY media_type
    """,
    tags=("multimodal",),
)
def media_features_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline composition: pandas decode stage feeding an ordinary
    JVM-side aggregation (map-side combine on a 3-value key)."""
    from ..functions import davg

    feats = media_decode_features(spark, sf_dir)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("assets"),
            davg("byte_mean", "avg_byte_mean"),
            F.min("byte_min").alias("global_min"),
            F.max("byte_max").alias("global_max"),
        )
        .orderBy("media_type")
    )
