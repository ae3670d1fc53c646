"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local version of the driver's CORRECTNESS gate (stricter:
exact values, not hashes)."""

from __future__ import annotations

import pytest

from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR
from tests.parity import compare, duck_register

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck_views(duck):
    duck_register(duck, SF_DIR)
    return duck


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck_views, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    res = compare(df, duck_views, spec.oracle)
    assert res["match"], f"{name}: {res['detail']} ({res['spark_rows']} vs {res['duck_rows']} rows)"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
