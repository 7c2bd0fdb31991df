"""Every registered query vs its DuckDB oracle on sf0.001 -- the in-repo
mirror of the driver's correctness gate (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from tests.oracle_utils import assert_match

registry._load_all()
_ORACLE_NAMES = sorted(
    name for name, spec in registry.REGISTRY.items() if spec.oracle is not None
)
_ROWS_ONLY_NAMES = sorted(
    name for name, spec in registry.REGISTRY.items() if spec.oracle is None
)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = registry.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_match(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = registry.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 85
    # oracle coverage must stay near-total: only inherently oracle-less
    # ops (physical-layout stats, Python hashing, approx estimators) may
    # be rows-only
    assert len(qs) - len(oracles) <= 5
