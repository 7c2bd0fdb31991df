"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's correctness gate: sort columns by name, canonicalize
every cell to a string, sort rows, compare exactly. The query suite is
designed so doubles are bit-identical across engines (see
functions/__init__.py determinism note), so exact string compare is the
right bar -- a tolerance would hide regressions.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pyarrow as pa


def canon_arrow_type(t: "pa.DataType") -> str:
    """Map an Arrow type to Spark simpleString vocabulary so dtype drift
    (e.g. DuckDB HUGEINT=decimal128(38,0) vs Spark BIGINT) fails locally
    exactly like the grading driver's type-sensitive value hash."""
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"array<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def canon_spark_type(simple: str) -> str:
    """Normalize Spark simpleString: timestamp_ntz == timestamp for our
    purposes (session TZ is pinned to UTC everywhere)."""
    if simple.startswith("timestamp"):
        return "timestamp"
    return simple


def spark_coltypes(df) -> dict[str, str]:
    return {
        f.name: canon_spark_type(f.dataType.simpleString())
        for f in df.schema.fields
    }


def duck_result_typed(
    con, sql: str
) -> tuple[list[str], list[tuple], dict[str, str]]:
    """One DuckDB execution yielding rows AND canonical column types (via
    Arrow) — dtype checking must not re-run the oracle query."""
    tbl = con.execute(sql.strip().rstrip(";")).fetch_arrow_table()
    cols = list(tbl.column_names)
    types = {f.name: canon_arrow_type(f.type) for f in tbl.schema}
    data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = [tuple(r) for r in zip(*data)] if tbl.num_rows else []
    return cols, rows, types


def duck_coltypes(con, sql: str) -> dict[str, str]:
    q = sql.strip().rstrip(";")
    tbl = con.execute(f"SELECT * FROM ({q}) LIMIT 0").fetch_arrow_table()
    return {f.name: canon_arrow_type(f.type) for f in tbl.schema}


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def assert_match(df, con, sql: str, name: str = "") -> None:
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows, d_types = duck_result_typed(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    s_types = spark_coltypes(df)
    type_drift = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]
    }
    assert not type_drift, (
        f"{name}: dtype drift (spark, duck) per column: {type_drift}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = canon_rows(s_cols, s_rows)
    d_canon = canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
