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
self-join could spill, this kernel cannot. Call sites must therefore
bound n_block BEFORE the groupBy (the capped variants rank-filter
members first).
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
        # length (per-length sub-kernels; cross-length pairs can never
        # match, and the a<b keep-first rule is per-pair so the union
        # over length groups is exact).
        dv_len = pdf["dv"].map(lambda v: -1 if v is None else len(v))
        drops = []
        for length, sub in pdf.groupby(dv_len.to_numpy(), sort=False):
            if length < 1 or len(sub) < 2:
                continue
            ids = sub["vec_id"].to_numpy()
            vecs = np.stack(sub["dv"].to_numpy())
            norms = sub["nrm"].to_numpy(dtype=np.float64)
            drops.append(dropped_ids_for_block(ids, vecs, norms, cos_min))
        drop = (
            np.concatenate(drops)
            if drops
            else pdf["vec_id"].to_numpy()[:0]
        )
        out = {k: np.full(len(drop), pdf[k].iloc[0]) for k in key_cols}
        out["drop_id"] = drop
        return pd.DataFrame(out)

    return kernel
