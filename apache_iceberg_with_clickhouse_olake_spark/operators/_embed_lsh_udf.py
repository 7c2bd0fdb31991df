"""Multi-band random-hyperplane LSH pandas UDF for embeddings, isolated
in a module WITHOUT ``from __future__ import annotations`` (same reason
as _simhash_udf.py: pyspark resolves pandas_udf type hints at define
time, and stringified annotations break that).

Exactness contract: band signatures must be bit-identical between this
vectorized numpy path and the DuckDB oracle's relational re-derivation.
Float dot products can't promise that (numpy blocks/SIMD-reorders the
accumulation; SQL SUM has its own order), so the dots are computed over
INTEGER-QUANTIZED components: x_q = floor(x * 2^20 + 0.5) as int64.
Integer addition is order-independent, so sign(sum(x_q * plane)) is
identical everywhere. Quantization only perturbs signs of dots within
2^-20 * dim of zero -- and any such pair was a coin flip to begin with.

Hyperplanes are the same md5-seeded +-1 literals as
similarity._plane ("hp-{p}-{i}" -> digest byte 0 parity); a unit test
pins the two derivations equal.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

DIM = 64
N_BANDS = 16
PLANES_PER_BAND = 8
QUANT = 1 << 20


def plane_matrix() -> np.ndarray:
    """(N_BANDS*PLANES_PER_BAND, DIM) int64 matrix of +-1 components."""
    n = N_BANDS * PLANES_PER_BAND
    out = np.empty((n, DIM), dtype=np.int64)
    for p in range(n):
        for i in range(DIM):
            h = hashlib.md5(f"hp-{p}-{i}".encode()).digest()[0]
            out[p, i] = 1 if h % 2 == 0 else -1
    return out


_PLANES = plane_matrix()


def band_values(vectors: np.ndarray) -> np.ndarray:
    """(n, N_BANDS) int32 band signatures for an (n, DIM) float batch."""
    vq = np.floor(vectors.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    bits = (vq @ _PLANES.T) >= 0  # (n, n_planes), exact integer dots
    vals = np.zeros((vectors.shape[0], N_BANDS), dtype=np.int32)
    for b in range(N_BANDS):
        for k in range(PLANES_PER_BAND):
            vals[:, b] |= bits[:, b * PLANES_PER_BAND + k].astype(
                np.int32
            ) << k
    return vals


def _bands_series(emb: pd.Series) -> pd.Series:
    if len(emb) == 0:
        return pd.Series([], dtype=object)
    vals = band_values(np.stack(emb.to_numpy()))
    return pd.Series(list(vals.tolist()))


def make_embed_bands_udf():
    """Built at call time, not module import (executor re-imports have no
    SparkSession to resolve the return type)."""
    return pandas_udf(_bands_series, "array<int>")
