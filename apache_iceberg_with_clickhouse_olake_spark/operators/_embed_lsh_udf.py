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


def make_embed_bands_udf(n_bands: int = N_BANDS,
                         planes_per_band: int = PLANES_PER_BAND):
    """Built at call time, not module import (executor re-imports have no
    SparkSession to resolve the return type). The default is the
    production 16x8 banding; any sweep config (see SWEEP_CONFIGS /
    embedding_neardup_config_sweep) is runnable by passing its
    (bands, planes_per_band) — signatures come from the same md5 plane
    family, so a user adopts a measured operating point directly."""
    if n_bands == N_BANDS and planes_per_band == PLANES_PER_BAND:
        return pandas_udf(_bands_series, "array<int>")
    if n_bands * planes_per_band > MAX_SWEEP_PLANES:
        raise ValueError(
            f"{n_bands}x{planes_per_band} needs "
            f"{n_bands * planes_per_band} planes; "
            f"max generated is {MAX_SWEEP_PLANES}"
        )

    def _series(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        vectors = np.stack(emb.to_numpy())
        vq = np.floor(
            vectors.astype(np.float64) * QUANT + 0.5
        ).astype(np.int64)
        planes = _SWEEP_PLANES[: n_bands * planes_per_band]
        bits = (vq @ planes.T) >= 0
        vals = np.zeros((vectors.shape[0], n_bands), dtype=np.int32)
        for j in range(n_bands):
            for k in range(planes_per_band):
                vals[:, j] |= bits[:, j * planes_per_band + k].astype(
                    np.int32
                ) << k
        return pd.Series(list(vals.tolist()))

    return pandas_udf(_series, "array<int>")


# --- Config sweep: recall/cost curve over (bands, planes_per_band) -------
#
# The first four configs re-slice the SAME 128 sign bits the production
# 16x8 banding computes (fixed hash budget, pure grouping trade-off);
# the last two extend the plane family to 256/512 bits (buying mid-band
# recall with more hashing instead of coarser bands). All planes come
# from the one md5 "hp-{p}-{i}" family, so config j's bits are a prefix
# re-grouping -- the oracle re-derives every bit relationally.
SWEEP_CONFIGS = ((8, 16), (16, 8), (32, 4), (64, 2), (32, 8), (64, 8))
MAX_SWEEP_PLANES = max(b * r for b, r in SWEEP_CONFIGS)
SWEEP_OFFSETS = []
_off = 0
for _b, _r in SWEEP_CONFIGS:
    SWEEP_OFFSETS.append(_off)
    _off += _b
SWEEP_TOTAL_VALS = _off


def sweep_plane_matrix() -> np.ndarray:
    n = MAX_SWEEP_PLANES
    out = np.empty((n, DIM), dtype=np.int64)
    for p in range(n):
        for i in range(DIM):
            h = hashlib.md5(f"hp-{p}-{i}".encode()).digest()[0]
            out[p, i] = 1 if h % 2 == 0 else -1
    return out


_SWEEP_PLANES = sweep_plane_matrix()


def sweep_band_values(vectors: np.ndarray) -> np.ndarray:
    """(n, SWEEP_TOTAL_VALS) int32: concatenated band signatures for every
    sweep config, from one 512-plane integer-dot bit matrix."""
    vq = np.floor(vectors.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    bits = (vq @ _SWEEP_PLANES.T) >= 0  # (n, MAX_SWEEP_PLANES)
    cols = []
    for b, r in SWEEP_CONFIGS:
        vals = np.zeros((vectors.shape[0], b), dtype=np.int32)
        for j in range(b):
            for k in range(r):
                vals[:, j] |= bits[:, j * r + k].astype(np.int32) << k
        cols.append(vals)
    return np.concatenate(cols, axis=1)


def _sweep_series(emb: pd.Series) -> pd.Series:
    if len(emb) == 0:
        return pd.Series([], dtype=object)
    vals = sweep_band_values(np.stack(emb.to_numpy()))
    return pd.Series(list(vals.tolist()))


def make_embed_sweep_udf():
    return pandas_udf(_sweep_series, "array<int>")
