"""Within-block pair-cosine keep-first kernel (r19 optimization round),
isolated in a module WITHOUT ``from __future__ import annotations``
(same reason as _simhash_udf.py: pyspark resolves pandas type hints at
define time, and stringified annotations break that).

Why this exists: the SemDeDup-family pair joins evaluated the cosine
filter as an interpreted HashJoin bound-condition -- thread dumps
showed every multiply boxing a java.lang.Double inside ZipWith.eval
(~4 us per pair), and the block-keyed join put each block's entire
O(n_block^2) pair stream on ONE task (the biggest leaf was a 1.2 s
straggler against a 42 ms median at sf0.1). This kernel replaces the
self-join + filter + distinct with one groupBy(block).applyInPandas
pass: each row crosses the shuffle ONCE (the self-join shipped it
twice), and the pair scoring runs vectorized in numpy (guide section
4.2 -- batches to native code).

Exactness contract (the reason this is NOT a numpy matmul): the engine
promises bit-identical cosines to the DuckDB oracle via the shared
left-fold order -- dot = ((0.0 + a0*b0) + a1*b1) + ... . BLAS/np.dot
block and SIMD-reorder the accumulation, so they cannot promise that.
Instead the kernel folds with ELEMENTWISE adds, sequential over the
dimension axis and vectorized over the pair axis:

    acc = 0.0 + a[:, 0] * b[:, 0]
    acc += a[:, j] * b[:, j]        # j = 1..dim-1, in order

Each element of ``acc`` experiences exactly the scalar IEEE-754
multiply/add sequence of the Spark/DuckDB fold (elementwise numpy ops
never reorder within an element), so thresholds compare identically.
The zero-denominator guard mirrors _cos: cos undefined -> never a
near-dup (NaN fails >=, exactly as SQL NULL does).

Memory (r19 ADVICE, stated honestly): _CHUNK_PAIRS bounds only the
PAIR arrays (~160 MB peak); the block's member frame itself is still
materialized whole by applyInPandas, so the true per-task bound is
O(n_block * dim) doubles + the chunk bound. A group Spark's streamed
self-join could spill, this kernel cannot. Call sites therefore bound
n_block BEFORE the groupBy: the capped variants rank-filter members
first, and every SemDeDup path routes through
clustering._salted_block_dropped (r20), which sub-splits oversized
blocks into salt classes scored by make_salted_block_kernel -- within-
salt groups plus cross-salt halves, exact under the a<b keep-first
rule.
"""

import numpy as np
import pandas as pd

# Upper bound on simultaneously-materialized pairs per chunk: ~4M pairs
# x (acc + term + index arrays, ~40 B/pair) ~ 160 MB peak per task.
_CHUNK_PAIRS = 4_000_000


def dropped_ids_for_block(
    vec_ids: np.ndarray, vecs: np.ndarray, norms: np.ndarray, cos_min: float
) -> np.ndarray:
    """Sorted unique ids b such that some a < b in the block has
    cos_pre(a, b) >= cos_min. ``vec_ids`` must be ascending; ``vecs``
    is (n, dim) float64; ``norms`` the precomputed _norm values."""
    n = len(vec_ids)
    if n < 2:
        return vec_ids[:0]
    dim = vecs.shape[1]
    dropped = np.zeros(n, dtype=bool)
    # enumerate i<j pairs in j-major chunks: rows j = lo..hi-1, each
    # against all i < j (the keep-first rule needs every lower id)
    j_idx = np.arange(n)
    pair_counts = j_idx  # row j contributes j pairs
    lo = 1
    while lo < n:
        hi = lo
        total = 0
        while hi < n and total + pair_counts[hi] <= _CHUNK_PAIRS:
            total += pair_counts[hi]
            hi += 1
        if hi == lo:  # single row exceeding the chunk bound: take it alone
            hi = lo + 1
            total = pair_counts[lo]
        ib = np.repeat(j_idx[lo:hi], pair_counts[lo:hi])
        ia = np.concatenate([np.arange(j) for j in range(lo, hi)])
        a = vecs[ia]
        b = vecs[ib]
        acc = 0.0 + a[:, 0] * b[:, 0]
        for d in range(1, dim):
            acc += a[:, d] * b[:, d]
        denom = norms[ia] * norms[ib]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom == 0.0, np.nan, acc / denom)
            hit = cos >= cos_min  # NaN -> False, same as SQL NULL
        dropped[np.unique(ib[hit])] = True
        lo = hi
    return vec_ids[dropped]


def dropped_ids_for_cross(
    ids_a: np.ndarray,
    vecs_a: np.ndarray,
    norms_a: np.ndarray,
    ids_b: np.ndarray,
    vecs_b: np.ndarray,
    norms_b: np.ndarray,
    cos_min: float,
) -> np.ndarray:
    """Ids from EITHER side that have a LOWER-id partner on the OTHER
    side with cos_pre >= cos_min (the cross-salt half of the a<b
    keep-first rule; within-side pairs are someone else's group).
    Operand order is irrelevant to bit-identity: IEEE-754 multiply is
    commutative and the fold order is over the DIMENSION axis only."""
    na, nb = len(ids_a), len(ids_b)
    if na == 0 or nb == 0:
        return ids_a[:0]
    dim = vecs_a.shape[1]
    dropped_a = np.zeros(na, dtype=bool)
    dropped_b = np.zeros(nb, dtype=bool)
    rows_per_chunk = max(1, _CHUNK_PAIRS // na)
    j_all = np.arange(na)
    for lo in range(0, nb, rows_per_chunk):
        hi = min(nb, lo + rows_per_chunk)
        ib = np.repeat(np.arange(lo, hi), na)
        ia = np.tile(j_all, hi - lo)
        a = vecs_a[ia]
        b = vecs_b[ib]
        acc = 0.0 + a[:, 0] * b[:, 0]
        for d in range(1, dim):
            acc += a[:, d] * b[:, d]
        denom = norms_a[ia] * norms_b[ib]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom == 0.0, np.nan, acc / denom)
            hit = cos >= cos_min  # NaN -> False, same as SQL NULL
        a_is_larger = ids_a[ia] > ids_b[ib]
        dropped_a[np.unique(ia[hit & a_is_larger])] = True
        dropped_b[np.unique(ib[hit & ~a_is_larger])] = True
    return np.concatenate([ids_a[dropped_a], ids_b[dropped_b]])


def _length_groups(pdf: pd.DataFrame):
    """Yield (sub-frame) per dv length after the NULL/ragged guard
    (see make_block_dropped_kernel): NULL-dv rows never match, and
    cross-length pairs never match, so scoring per length is exact."""
    dv_len = pdf["dv"].map(lambda v: -1 if v is None else len(v))
    for length, sub in pdf.groupby(dv_len.to_numpy(), sort=False):
        if length < 1 or len(sub) < 2:
            continue
        yield sub


def make_salted_block_kernel(key_cols, cos_min):
    """applyInPandas kernel over SALTED groups: (key_cols..., lo, hi,
    salt, vec_id, dv, nrm) -> (key_cols..., drop_id). A block whose
    member count exceeds the caller's per-task bound is split into s
    deterministic salt classes; class pair (g, g) scores within-salt
    pairs and (i, j), i<j, scores cross pairs only, so every a<b pair
    of the original block is scored EXACTLY once and the union of the
    groups' drop sets equals the unsalted drop set (the caller applies
    the distinct: one member can be dropped by several groups)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        lo = int(pdf["lo"].iloc[0])
        hi = int(pdf["hi"].iloc[0])
        drops = []
        for sub in _length_groups(pdf):
            if lo == hi:
                drops.append(
                    dropped_ids_for_block(
                        sub["vec_id"].to_numpy(),
                        np.stack(sub["dv"].to_numpy()),
                        sub["nrm"].to_numpy(dtype=np.float64),
                        cos_min,
                    )
                )
            else:
                sa = sub[sub["salt"].to_numpy() == lo]
                sb = sub[sub["salt"].to_numpy() == hi]
                if len(sa) == 0 or len(sb) == 0:
                    continue
                drops.append(
                    dropped_ids_for_cross(
                        sa["vec_id"].to_numpy(),
                        np.stack(sa["dv"].to_numpy()),
                        sa["nrm"].to_numpy(dtype=np.float64),
                        sb["vec_id"].to_numpy(),
                        np.stack(sb["dv"].to_numpy()),
                        sb["nrm"].to_numpy(dtype=np.float64),
                        cos_min,
                    )
                )
        drop = (
            np.concatenate(drops) if drops else pdf["vec_id"].to_numpy()[:0]
        )
        out = {k: np.full(len(drop), pdf[k].iloc[0]) for k in key_cols}
        out["drop_id"] = drop
        return pd.DataFrame(out)

    return kernel


def make_block_dropped_kernel(key_cols, cos_min):
    """applyInPandas kernel: (key_cols..., vec_id, dv, nrm) block ->
    (key_cols..., drop_id) rows, one per dropped member, pre-distinct."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        # NULL/ragged dv guard (r19 ADVICE): the old join evaluated the
        # cosine of a NULL dv -- and of a length-mismatched pair, whose
        # zip_with pads with NULLs -- to NULL, which never satisfies
        # >= cos_min. Mirror that: NULL-dv rows neither drop nor get
        # dropped (filtered out), and pairs only form within one dv
        # length (_length_groups; cross-length pairs can never match,
        # and the a<b keep-first rule is per-pair so the union over
        # length groups is exact).
        drops = [
            dropped_ids_for_block(
                sub["vec_id"].to_numpy(),
                np.stack(sub["dv"].to_numpy()),
                sub["nrm"].to_numpy(dtype=np.float64),
                cos_min,
            )
            for sub in _length_groups(pdf)
        ]
        drop = (
            np.concatenate(drops)
            if drops
            else pdf["vec_id"].to_numpy()[:0]
        )
        out = {k: np.full(len(drop), pdf[k].iloc[0]) for k in key_cols}
        out["drop_id"] = drop
        return pd.DataFrame(out)

    return kernel
