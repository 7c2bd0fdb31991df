"""Persist-lifecycle helpers shared by the iterative operators
(clustering's Lloyd loop, the BPE merge-learning loop).

Spark never auto-unpersists: across a 144-op correctness gate plus
repeated bench iterations, leaked cache blocks accumulate for the
session lifetime and show up as memory-pressure-driven bench drift.
Every ``persist()`` in an iterative operator goes through
:func:`persist_tracked`, and each registered query drains the registry
via :func:`finalize` after its terminal action (the registered-query
materialization idiom evolution.py pioneered: the returned frame must
stay valid after its cached inputs are dropped, so it is rebuilt from
local rows). Queries execute sequentially (driver gate / pytest), so a
module-level list is safe here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_LIVE_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() with release tracking; see module docstring."""
    df = df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every tracked frame (also called mid-op once a
    persisted training input has been fully consumed -- e.g. after the
    k-means index artifact is published to disk)."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def finalize(spark: SparkSession, out: DataFrame) -> DataFrame:
    """Materialize the small result rows, release the tracked caches,
    and return a frame rebuilt from the local rows (valid after its
    cached inputs are gone)."""
    rows = out.collect()
    release_caches()
    return spark.createDataFrame(rows, out.schema)
