"""Run every registered query against its DuckDB oracle at sf0.01 —
the same comparison the driver's correctness gate performs."""

from __future__ import annotations

import pytest

from climate_data_pipeline_spark import registry

from .oracle import assert_parity

registry._load_all()
WITH_ORACLE = sorted(n for n, e in registry.REGISTRY.items() if e.oracle)
ROWS_ONLY = sorted(n for n, e in registry.REGISTRY.items() if not e.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    e = registry.REGISTRY[name]
    assert_parity(e.fn(spark, sf_dir), e.oracle, sf_dir, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    df = registry.REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
