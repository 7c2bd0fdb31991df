"""Lifecycle semantics of the scoped persist registry (r9 ADVICE: an
operator that raises mid-build must not pin frames for later queries,
and nested composition must never release a caller's live caches)."""

from __future__ import annotations

import pytest

from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
    cache_scope,
    finalize,
    persist_tracked,
    release_caches,
    scoped,
)


def _is_cached(df) -> bool:
    return df.storageLevel.useMemory or df.storageLevel.useDisk


def test_exception_in_scope_releases_its_caches(spark):
    df = spark.range(10)
    with pytest.raises(RuntimeError):
        with cache_scope():
            persist_tracked(df)
            assert _is_cached(df)
            raise RuntimeError("mid-build failure")
    assert not _is_cached(df)


def test_nested_scope_cannot_release_outer_caches(spark):
    outer = spark.range(5)
    inner = spark.range(7)
    with cache_scope():
        persist_tracked(outer)
        with cache_scope():
            persist_tracked(inner)
            # the inner op's mid-op release (the streaming trainer
            # idiom) must drain only ITS scope
            release_caches()
            assert not _is_cached(inner)
            assert _is_cached(outer)
        assert _is_cached(outer)
    assert not _is_cached(outer)


def test_finalize_releases_current_scope_even_on_failed_collect(spark):
    from pyspark.sql import functions as F

    df = spark.range(4)
    with cache_scope():
        persist_tracked(df)
        bad = df.select(
            F.assert_true(F.col("id") < 2).alias("x")
        )
        with pytest.raises(Exception):
            finalize(spark, bad)
        assert not _is_cached(df)


def test_scoped_decorator_wraps_a_query_fn(spark):
    captured = {}

    @scoped
    def op(spark, sf_dir):
        df = spark.range(3)
        captured["df"] = persist_tracked(df)
        return finalize(spark, df)

    out = op(spark, "unused")
    assert out.count() == 3
    assert not _is_cached(captured["df"])
    # the finalized frame is rebuilt from local rows: still valid here
    assert out.count() == 3
