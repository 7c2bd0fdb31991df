"""r20 optimization-round internals: the salted SemDeDup kernel groups.

The salting sub-splits oversized blocks before the applyInPandas pair
kernel (bounded group memory + no one-leaf straggler). These tests pin
the exactness contract: the salted drop set equals the unsalted drop
set BIT-IDENTICALLY for any salt granularity, because every a<b pair is
scored exactly once (within-salt groups + cross-salt halves) by the
same fold-order-exact kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _mk_members(spark, n=120, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rows.append((0, int(i), [float(x) for x in rng.randn(dim)]))
    # adversarial salt content: a replica clique (exact dups share a
    # cosine of 1 with every clique-mate) and a zero vector
    rows.append((0, n, rows[0][2]))
    rows.append((0, n + 1, rows[0][2]))
    rows.append((0, n + 2, [0.0] * dim))
    # a second block, to prove keys keep groups apart
    for i in range(40):
        rows.append((1, 1000 + i, [float(x) for x in rng.randn(dim)]))
    df = spark.createDataFrame(
        rows, "cluster long, vec_id long, dv array<double>"
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (  # noqa: E501
        _norm,
    )

    return df.select(
        "cluster", "vec_id", "dv", _norm(F.col("dv")).alias("nrm")
    )


def _drops(df) -> list[tuple]:
    return sorted((r.cluster, r.drop_id) for r in df.collect())


def test_salted_drop_set_matches_unsalted_bitwise(spark):
    """Forced tiny cap (every block splits many ways, cross-salt path
    exercised) vs cap larger than any block (s=1 everywhere, the
    pre-r20 single-group shape): identical drop sets."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (  # noqa: E501
        _salted_block_dropped,
    )

    members = _mk_members(spark).persist()
    try:
        schema = "cluster bigint, drop_id bigint"
        unsalted = _drops(
            _salted_block_dropped(members, ["cluster"], schema,
                                  cap_rows=100000)
        )
        assert len(unsalted) > 0, "fixture must produce drops"
        for cap in (3, 7, 50):
            salted = _drops(
                _salted_block_dropped(members, ["cluster"], schema,
                                      cap_rows=cap)
            )
            assert salted == unsalted, f"cap_rows={cap} diverged"
    finally:
        members.unpersist()


def test_salted_matches_plain_join_semantics(spark):
    """The salted pipeline must reproduce the original self-join +
    distinct semantics (drop b iff some a<b in the block clears the
    threshold) -- checked against a literal Spark join."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (  # noqa: E501
        _SEMDEDUP_COS,
        _salted_block_dropped,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (  # noqa: E501
        _cos_pre,
    )

    members = _mk_members(spark, n=60, seed=11).persist()
    try:
        a, b = members.alias("a"), members.alias("b")
        join_drops = sorted(
            (r.cluster, r.drop_id)
            for r in a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(
                _cos_pre(
                    F.col("a.dv"), F.col("a.nrm"),
                    F.col("b.dv"), F.col("b.nrm"),
                )
                >= _SEMDEDUP_COS
            )
            .select(
                F.col("a.cluster").alias("cluster"),
                F.col("b.vec_id").alias("drop_id"),
            )
            .distinct()
            .collect()
        )
        salted = _drops(
            _salted_block_dropped(
                members, ["cluster"], "cluster bigint, drop_id bigint",
                cap_rows=5,
            )
        )
        assert salted == join_drops
    finally:
        members.unpersist()


def test_cross_kernel_drops_only_larger_ids():
    """dropped_ids_for_cross: only the LARGER id of a matching cross
    pair drops, chunking is invisible, zero-norm rows never match."""
    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        _pair_cos_udf as k,
    )

    rng = np.random.RandomState(5)
    na, nb, dim = 37, 53, 8
    ids_a = np.arange(0, 2 * na, 2, dtype=np.int64)       # even ids
    ids_b = np.arange(1, 2 * nb + 1, 2, dtype=np.int64)   # odd ids
    va = rng.randn(na, dim)
    vb = rng.randn(nb, dim)
    vb[5] = va[3]          # an exact cross duplicate: ids 6 (a) vs 11 (b)
    va[10] = 0.0           # zero norm on the a side
    norms_a = np.sqrt((va * va).sum(axis=1))
    norms_b = np.sqrt((vb * vb).sum(axis=1))

    full = sorted(
        k.dropped_ids_for_cross(ids_a, va, norms_a, ids_b, vb, norms_b, 0.5)
    )
    orig = k._CHUNK_PAIRS
    try:
        k._CHUNK_PAIRS = 41
        chunked = sorted(
            k.dropped_ids_for_cross(
                ids_a, va, norms_a, ids_b, vb, norms_b, 0.5
            )
        )
    finally:
        k._CHUNK_PAIRS = orig
    assert full == chunked and len(full) > 0
    assert 11 in full and 6 not in full, "larger id of the dup pair drops"
    assert 20 not in full, "zero-norm row must never drop"

    # brute-force reference with the same fold
    expected = set()
    for i in range(na):
        for j in range(nb):
            acc = 0.0
            for d in range(dim):
                acc += va[i, d] * vb[j, d]
            den = norms_a[i] * norms_b[j]
            if den == 0.0:
                continue
            if acc / den >= 0.5:
                expected.add(int(max(ids_a[i], ids_b[j])))
    assert full == sorted(expected)


def test_salted_kernel_null_dv_guard():
    """The salted kernel keeps the NULL/ragged-dv guard: NULL rows
    neither drop nor get dropped, on both the within and cross paths."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._pair_cos_udf import (  # noqa: E501
        make_salted_block_kernel,
    )

    kern = make_salted_block_kernel(("cluster",), 0.5)
    pdf = pd.DataFrame(
        {
            "cluster": [1] * 4,
            "lo": [0] * 4,
            "hi": [1] * 4,
            "salt": [0, 0, 1, 1],
            "vec_id": [0, 1, 2, 3],
            "dv": [[3.0, 4.0], None, [3.0, 4.0], None],
            "nrm": [5.0, None, 5.0, None],
        }
    )
    out = kern(pdf)
    assert sorted(out["drop_id"].tolist()) == [2]
