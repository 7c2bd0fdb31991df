"""r19 optimization-round internals: the split-starved widen helper.

The headline wins this round restructure HOW queries execute, never what
they compute (every touched query re-passes the DuckDB oracle in
scripts/driver_sim.py); these tests pin the new helper's plan-level
contract so a later refactor cannot silently turn the adaptive widen
into an unconditional 100 TB repartition (or into a no-op where it is
load-bearing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.sources import parquet as pq


def test_widen_noop_when_scan_is_already_wide(spark, tmp_path):
    """Production layout (splits >= parallelism): plan untouched -- the
    widen must never become a blanket repartition of a big table."""
    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide.parquet")
    spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(par * 2).write.parquet(path)
    df = spark.read.parquet(path)
    out = pq.widen_split_starved(df, "id", path)
    assert out is df, "already-wide scan must be returned unchanged"


def test_widen_restores_parallelism_on_single_split(spark, tmp_path):
    """Fixture layout (one row group / one split): the helper must hash
    the rows across defaultParallelism partitions."""
    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "narrow.parquet")
    spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() < par  # precondition: starved
    out = pq.widen_split_starved(df, "id", path)
    assert out is not df
    assert out.rdd.getNumPartitions() == par
    # contents unchanged (the exchange moves rows, never rewrites them)
    assert sorted(r.id for r in out.collect()) == list(range(10_000))


def test_pair_cos_kernel_matches_spark_fold_bitwise(spark):
    """The numpy keep-first kernel must reproduce the Spark/DuckDB
    left-fold cosine BIT-IDENTICALLY (its module docstring's contract):
    same drop set on a corpus slice, including zero-norm rows (cos
    undefined -> never a near-dup) and ties at the threshold."""
    import numpy as np
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.operators._pair_cos_udf import (  # noqa: E501
        dropped_ids_for_block,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _cos_pre,
        _norm,
    )

    # adversarial block: near-parallel pairs, an exact-threshold pair,
    # and a zero vector (denominator guard)
    rows = []
    rng = np.random.RandomState(7)
    for i in range(40):
        rows.append((i, [float(x) for x in rng.randn(8)]))
    rows.append((40, [0.0] * 8))          # zero norm
    rows.append((41, rows[0][1]))          # exact duplicate of row 0
    df = spark.createDataFrame(rows, "vec_id long, dv array<double>")
    withn = df.select("vec_id", "dv", _norm(F.col("dv")).alias("nrm"))
    a, b = withn.alias("a"), withn.alias("b")
    tau = 0.3
    spark_drops = sorted(
        r.drop_id
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(
            _cos_pre(F.col("a.dv"), F.col("a.nrm"),
                     F.col("b.dv"), F.col("b.nrm")) >= tau
        )
        .select(F.col("b.vec_id").alias("drop_id"))
        .distinct()
        .collect()
    )
    pdf = withn.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in pdf])
    vecs = np.stack([np.array(r.dv) for r in pdf])
    norms = np.array([r.nrm for r in pdf])
    kernel_drops = sorted(dropped_ids_for_block(ids, vecs, norms, tau))
    assert kernel_drops == spark_drops
    assert 40 not in kernel_drops, "zero-norm row must never drop"
    assert 41 in kernel_drops, "exact duplicate must drop"


def test_pair_cos_kernel_chunking_is_invisible():
    """Chunked pair enumeration (the adversarial-block memory bound)
    must give the same drop set as one unchunked pass."""
    import numpy as np

    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        _pair_cos_udf as k,
    )

    rng = np.random.RandomState(11)
    n, dim = 300, 8
    ids = np.arange(n, dtype=np.int64)
    vecs = rng.randn(n, dim)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    full = list(k.dropped_ids_for_block(ids, vecs, norms, 0.5))
    orig = k._CHUNK_PAIRS
    try:
        k._CHUNK_PAIRS = 97  # force many tiny chunks
        chunked = list(k.dropped_ids_for_block(ids, vecs, norms, 0.5))
    finally:
        k._CHUNK_PAIRS = orig
    assert full == chunked and len(full) > 0


def test_widen_memoizes_per_path_and_parallelism(spark, tmp_path):
    """The probe result is memoized on (abspath, parallelism, layout
    fingerprint): the bench rebuilds each query 5-7x and the fixture
    path is immutable, so only the first build pays the partition-count
    probe."""
    import os

    path = str(tmp_path / "memo.parquet")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    key = (
        os.path.abspath(path),
        spark.sparkContext.defaultParallelism,
        *pq._layout_fingerprint(path),
    )
    pq._STARVED.pop(key, None)
    pq.widen_split_starved(df, "id", path)
    assert key in pq._STARVED and pq._STARVED[key] is True


def test_widen_memo_invalidates_on_rewrite(spark, tmp_path):
    """Rewriting the file at a memoized path must re-probe (r19 ADVICE:
    the old (path, cpus) key silently reused a stale decision after an
    in-process rewrite)."""
    import os
    import time

    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "rw.parquet")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    narrow = spark.read.parquet(path)
    pq.widen_split_starved(narrow, "id", path)  # memoized: starved=True

    time.sleep(0.05)  # ensure a distinct mtime_ns
    spark.range(0, 10_000).repartition(par * 2).write.mode(
        "overwrite"
    ).parquet(path)
    wide = spark.read.parquet(path)
    out = pq.widen_split_starved(wide, "id", path)
    assert out is wide, "rewritten wide layout must re-probe to no-op"


def test_pair_cos_kernel_null_and_ragged_dv_never_match(spark):
    """r19 ADVICE: the old join evaluated cosine(NULL dv) and the
    zip_with of length-mismatched vectors to NULL -- never a near-dup.
    The kernel must neither crash on such rows nor let them drop (or be
    dropped by) anything, and cross-length pairs must never match."""
    import pandas as pd

    from apache_iceberg_with_clickhouse_olake_spark.operators._pair_cos_udf import (  # noqa: E501
        make_block_dropped_kernel,
    )

    kern = make_block_dropped_kernel(("blk",), 0.5)
    pdf = pd.DataFrame(
        {
            "blk": [1] * 6,
            "vec_id": [0, 1, 2, 3, 4, 5],
            # ids 0/1: identical 2-dim vectors (same-length dup pair);
            # id 2: NULL dv; ids 3/4: identical 3-dim vectors (dup pair
            # in the OTHER length group); id 5: 2-dim duplicate again
            "dv": [
                [3.0, 4.0],
                [3.0, 4.0],
                None,
                [1.0, 2.0, 2.0],
                [1.0, 2.0, 2.0],
                [3.0, 4.0],
            ],
            "nrm": [5.0, 5.0, None, 3.0, 3.0, 5.0],
        }
    )
    out = kern(pdf)
    assert sorted(out["drop_id"].tolist()) == [1, 4, 5]
    assert 2 not in set(out["drop_id"]), "NULL dv must never be dropped"
