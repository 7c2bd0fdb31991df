"""Multimodal operator tests beyond the oracle gate: the resize path's
numpy reference, decode-stub behavior, payload determinism, and the
metadata-pushdown plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from apache_iceberg_with_clickhouse_olake_spark.operators.multimodal import (
    _OUT_DIM,
    decode_with_codec,
    image_resize_thumbnail,
    video_frame_sample,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.multimodal import (
    FRAME_STEP,
    gen_media,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_with_codec(b"\x00\x01", "png")


def test_media_payload_deterministic(spark, sf_dir):
    a = gen_media(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    b = gen_media(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    assert a == b
    for row in a:
        assert isinstance(row.payload, (bytes, bytearray))
        assert len(row.payload) == row.meta.n_bytes
        assert 128 <= row.meta.n_bytes <= 512


def test_resize_matches_numpy_reference(spark, sf_dir):
    media = {
        r.doc_id: r
        for r in gen_media(spark, sf_dir)
        .filter("media_type = 'image'")
        .collect()
    }
    out = image_resize_thumbnail(spark, sf_dir).collect()
    assert len(out) == len(media) > 0
    for row in out:
        src = media[row.doc_id]
        arr = np.frombuffer(src.payload, dtype=np.uint8)
        w, h = src.meta.width, src.meta.height
        px = arr[(np.arange(h * w) % arr.size)].reshape(h, w)
        small = px.reshape(_OUT_DIM, h // _OUT_DIM, _OUT_DIM, w // _OUT_DIM).mean(
            axis=(1, 3)
        )
        assert row.out_w == row.out_h == _OUT_DIM
        # closed form: sum(block_means) == total/(bh*bw); numpy's pooled
        # sum agrees up to float addition order
        assert row.px_checksum == pytest.approx(float(small.sum()), rel=1e-9)
        assert row.px_mean == pytest.approx(float(small.mean()), rel=1e-9)
        assert row.px_checksum == int(px.sum()) / (
            (h // _OUT_DIM) * (w // _OUT_DIM)
        )


def test_frame_sample_counts(spark, sf_dir):
    vids = (
        gen_media(spark, sf_dir)
        .filter("media_type = 'video'")
        .select("doc_id", "meta.n_frames")
        .collect()
    )
    expected = sum(len(range(0, r.n_frames, FRAME_STEP)) for r in vids)
    assert video_frame_sample(spark, sf_dir).count() == expected


def test_catalog_stats_prunes_payload(spark, sf_dir):
    """media_catalog_stats must not read the payload bytes: the physical
    plan's parquet ReadSchema should only carry doc_id (everything else
    derives from it)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.multimodal import (
        media_catalog_stats,
    )

    plan = media_catalog_stats(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
