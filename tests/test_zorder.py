"""Z-order clustered write: pins the property the layout exists for —
every output file owns a disjoint z-range, so parquet min/max footer
stats can prune files for predicates on either clustering column."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.io.zorder import BITS, zorder_expr, zorder_write
from tests.conftest import SF_DIR


def test_zorder_write_files_cover_disjoint_z_ranges(spark, tmp_path):
    part = load_table(spark, SF_DIR, "part")
    out = str(tmp_path / "part_z")
    zorder_write(part, "p_partkey", "p_size", out, n_files=4)

    back = spark.read.parquet(out)
    z = F.expr(
        zorder_expr(
            f"(CAST(p_partkey AS BIGINT) % {1 << BITS})",
            f"(CAST(p_size AS BIGINT) % {1 << BITS})",
        )
    )
    ranges = (
        back.withColumn("f", F.input_file_name())
        .withColumn("z", z)
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(ranges) > 1  # the layout actually split into multiple files
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (_, prev_hi), (lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= lo  # disjoint (boundary value may repeat across files)

    # nothing lost or duplicated by the re-layout
    assert back.count() == part.count()


def test_zorder_value_locality(spark):
    # Morton curve property: nearby z => nearby (x, y) cell. Spot-pin the
    # encoding itself: z of (x, y) interleaves bits exactly.
    rows = spark.sql(
        f"SELECT CAST({zorder_expr('3', '5')} AS BIGINT) AS z"
    ).collect()
    # x=3 -> bits 0,1 at even positions = 1 + 4; y=5 -> bits 0,2 at odd = 2 + 32
    assert rows[0].z == 1 + 4 + 2 + 32
