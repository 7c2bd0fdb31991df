"""SimHash pandas UDF, isolated in a module WITHOUT ``from __future__
import annotations``: pyspark resolves pandas_udf type hints at define
time, and stringified annotations (PEP 563) break that resolution --
keeping real hints here lets us use the modern hint-based API instead of
the deprecated PandasUDFType."""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _simhash_batch(texts) -> list:
    """64-bit simhash over whitespace tokens, md5-derived per-token hashes.
    Pure function -> deterministic across executors/partitionings.

    Vectorized: all token digests in a batch unpack to one (n_tokens, 64)
    bit matrix (np.unpackbits), so the per-bit +-1 vote is a numpy column
    sum instead of a 64x-per-token Python loop. Output is bit-identical
    to a scalar implementation using the SAME ASCII-whitespace tokenizer
    (pinned by the determinism test). Note the tokenizer is deliberately
    ASCII-only to match the Java/DuckDB '\\s' twins -- it is NOT
    equivalent to Python str.split(), which also breaks on Unicode
    whitespace, so fingerprints differ from a str.split()-based
    implementation on non-ASCII-whitespace documents."""
    import hashlib
    import re

    import numpy as np

    # ASCII-whitespace split, matching Java/RE2 '\\s+' used by the
    # Spark/DuckDB tokens() twins — Python str.split() also breaks on
    # Unicode whitespace (\xa0,  , ...), which would silently
    # diverge from the SQL oracle on non-ASCII corpora
    ws = re.compile(r"[ \t\n\r\f\v]+")

    # column j of unpackbits(bitorder='big') is bit (63-j) of the
    # big-endian uint64, so this weight vector re-assembles the hash in
    # the original (h >> bit) & 1 bit order
    weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))

    out = []
    for t in texts:
        toks = [x for x in ws.split((t or "").lower()) if x]
        if not toks:
            out.append(0)
            continue
        digests = b"".join(
            hashlib.md5(tok.encode("utf-8")).digest()[:8] for tok in toks
        )
        bits = np.unpackbits(
            np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8), axis=1
        )
        # ones-count per bit: vote = ones - zeros = 2*ones - n > 0
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
        v = int(((votes > 0).astype(np.uint64) * weights).sum())
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
