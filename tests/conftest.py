from __future__ import annotations

import os

import pytest

from cdc_export_system_spark.session import get_spark

# Default fast scale; export TEST_SF_DIR=/root/testdata/sf0.01 to run the
# parity suite at the driver's correctness scale.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="cdc-export-tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
