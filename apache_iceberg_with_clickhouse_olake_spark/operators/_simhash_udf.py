"""SimHash pandas UDF, isolated in a module WITHOUT ``from __future__
import annotations``: pyspark resolves pandas_udf type hints at define
time, and stringified annotations (PEP 563) break that resolution --
keeping real hints here lets us use the modern hint-based API instead of
the deprecated PandasUDFType."""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _simhash_batch(texts) -> list:
    """64-bit simhash over whitespace tokens, md5-derived per-token hashes.
    Pure function -> deterministic across executors/partitionings."""
    import hashlib

    out = []
    for t in texts:
        counts = [0] * 64
        toks = (t or "").lower().split()
        for tok in toks:
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            for bit in range(64):
                counts[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if counts[bit] > 0:
                v |= 1 << bit
        # present as signed int64
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return out


def _simhash_series(texts: pd.Series) -> pd.Series:
    return pd.Series(_simhash_batch(texts.tolist()))


def make_simhash_udf():
    """Build the UDF at call time: a module-level @pandas_udf decorator
    would run during the EXECUTOR's import of this module (python workers
    re-import referenced modules), where no SparkSession exists to
    resolve the return type."""
    return pandas_udf(_simhash_series, "long")
