"""Empty-input robustness: every registered query must build and execute
against a schema-only (zero-row) star schema without raising.

The reference pins one empty-input edge (empty export => no file, no
watermark advance); a general engine owes the same grace everywhere — a
0-row partition is the steady state of an incremental pipeline's quiet
hours, and a driver-side scalar (count, mean, model fit) computed from an
empty frame must not turn into a ZeroDivisionError/None crash at 3 a.m.
Row counts are not asserted (an empty input yields an empty — or
all-zero-metrics — result by op-specific semantics); only that the full
plan builds, runs, and returns."""

from __future__ import annotations

import pytest

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.schemas import STAR_TABLES
from tests.conftest import SF_DIR

REGISTRY = load_all()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in STAR_TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    REGISTRY[name].fn(spark, empty_sf_dir).count()
