"""Cross-engine fuzz of the text primitives every dedup/text oracle
leans on: norm_text, tokens and md5_int60 must agree BIT-FOR-BIT between
Spark (Java regex + JVM lower/md5) and DuckDB (RE2-style regex +
utf8proc lower + its md5) for any input in the pinned domain, or every
fingerprint-based oracle comparison in the suite is built on sand.

Domain pinned here: printable ASCII, the five ASCII whitespace controls,
and Latin-1 accented letters -- a superset of what the fixtures contain.
Exotic case-folding codepoints (dotted İ, ẞ, Greek final sigma) are
deliberately OUT of the pinned domain: Java's toLowerCase and utf8proc
diverge on some of them, and no fixture or oracle constant uses them."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.functions import (
    md5_int60,
    md5_int60_sql,
    norm_text,
    norm_text_sql,
    tokens,
    tokens_sql,
)

_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\r\x0b\x0c"
    ".,;:!?'\"()[]{}<>-_/\\|@#$%^&*+=~`"
    "àâäéèêëïîôöùûüçñÀÉÈÖÜÑ"
)

_texts = st.lists(
    st.text(alphabet=_ALPHABET, max_size=60),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_texts)
def test_norm_tokens_fingerprint_parity(spark, texts):
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "doc_id",
            norm_text(F.col("text")).alias("norm"),
            tokens(F.col("text")).alias("toks"),
            md5_int60(norm_text(F.col("text"))).alias("fp"),
        )
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    try:
        con.register("docs", pdf)
        want = con.execute(
            f"""
            SELECT doc_id,
                   {norm_text_sql('text')} AS norm,
                   {tokens_sql('text')} AS toks,
                   {md5_int60_sql(norm_text_sql('text'))} AS fp
            FROM docs ORDER BY doc_id
            """
        ).fetchall()
    finally:
        con.close()
    assert len(got) == len(want)
    for s_row, d_row in zip(got, want):
        assert s_row["norm"] == d_row[1], (repr(s_row["norm"]), repr(d_row[1]))
        assert list(s_row["toks"]) == list(d_row[2]), (
            s_row["toks"],
            d_row[2],
        )
        assert s_row["fp"] == d_row[3], (s_row["fp"], d_row[3])


# Full double-precision domain to 1e12: the helpers' engine-stability
# contract. Two divergence classes were hypothesis-found and then
# FIXED by routing the oracle snap through the shortest decimal
# representation (functions.dsnap_sql):
#   1. shortest-repr half-point ties (281474977.6816645: Spark rounds
#      the Java shortest string HALF_UP to ...665, plain DuckDB rounds
#      the exact binary expansion to ...664);
#   2. >~1e11 magnitudes where a double's ULP exceeds the 1e-6 decimal
#      scale, so exact-binary vs shortest-string casts land on adjacent
#      decimals (observed: 576460752304.8789 vs ...8788).
# Both engines now round the SAME digit string with the same HALF_UP
# tie rule, so the fuzz domain deliberately spans past both former
# boundaries.
_doubles = st.lists(
    st.floats(
        min_value=-1e12,
        max_value=1e12,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_doubles)
def test_decimal_snap_aggregate_parity(spark, xs):
    """The numeric foundation: dsum/davg/dround must be bit-identical
    across engines for arbitrary doubles in the DECIMAL(30,6) domain --
    order-independence of the decimal sum plus exact HALF_UP tie
    rounding is what lets every money/ratio oracle compare by value
    hash instead of tolerance."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import (
        davg,
        davg_sql,
        dround,
        dround_sql,
        dsum,
        dsum_sql,
    )

    pdf = pd.DataFrame({"x": xs})
    sdf = spark.createDataFrame(pdf)
    s_row = (
        sdf.agg(
            dsum("x", "s"),
            davg("x", "a"),
        ).collect()[0]
    )
    s_r3 = (
        sdf.select(dround(F.col("x"), 3).alias("r")).orderBy("r").collect()
    )
    con = duckdb.connect()
    try:
        con.register("t", pdf)
        d_s, d_a = con.execute(
            f"SELECT {dsum_sql('x')} AS s, {davg_sql('x')} AS a FROM t"
        ).fetchone()
        d_r3 = [
            r[0]
            for r in con.execute(
                f"SELECT {dround_sql('x', 3)} AS r FROM t ORDER BY r"
            ).fetchall()
        ]
    finally:
        con.close()
    assert repr(s_row["s"]) == repr(d_s), (s_row["s"], d_s)
    assert repr(s_row["a"]) == repr(d_a), (s_row["a"], d_a)
    assert [repr(r["r"]) for r in s_r3] == [repr(v) for v in d_r3]


# Token-count domain for mixture weights: non-negative integers up to
# 1e9 tokens per (source, lang) group — far above anything a real
# corpus rollup produces per group at sf<=1, and the magnitude where
# POWER's double result still has ULP far below the DECIMAL(30,6)
# snap used before comparison.
_tok_totals = st.lists(
    st.integers(min_value=0, max_value=10**9),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_tok_totals)
def test_power_normalization_parity(spark, toks):
    """corpus_mixture_weights' numeric core: tokens^0.7 normalized by
    the group sum must agree bit-for-bit after the decimal snap. JVM
    Math.pow and libm pow are each within 1 ulp of correctly rounded;
    this pins that the residual ulp never survives dround(..., 6) on
    the token-count domain."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import (
        dround,
        dround_sql,
    )

    pdf = pd.DataFrame({"i": range(len(toks)), "t": toks})
    sdf = spark.createDataFrame(pdf)
    p_all = sum(float(t) ** 0.7 for t in toks)
    got = (
        sdf.select(
            "i",
            dround(
                F.pow(F.col("t").cast("double"), 0.7)
                / F.nullif(F.lit(p_all), F.lit(0.0)),
                6,
            ).alias("w"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    try:
        con.register("t", pdf)
        want = con.execute(
            f"""
            SELECT i,
                   {dround_sql(
                       'POWER(CAST(t AS DOUBLE), 0.7)'
                       ' / NULLIF(SUM(POWER(CAST(t AS DOUBLE), 0.7))'
                       '          OVER (), 0.0)',
                   6)} AS w
            FROM t ORDER BY i
            """
        ).fetchall()
    finally:
        con.close()
    for s_row, d_row in zip(got, want):
        assert repr(s_row["w"]) == repr(d_row[1]), (s_row["w"], d_row[1])
