"""Bucketed co-located join: the ingest-time shuffle trade. The join of
two tables bucketed+sorted on the join key must plan with ZERO Exchange
operators (and no broadcast — it's genuinely co-located, not just small),
and return exactly the same rows as the plain parquet join."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cdc_export_system_spark.io.bucketed import bucketed_orders_lineitem_join
from cdc_export_system_spark.io.sources import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_is_exchange_free(spark):
    df = bucketed_orders_lineitem_join(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark):
    bucketed = bucketed_orders_lineitem_join(spark, SF_DIR)
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    plain = o.join(l, o.o_orderkey == l.l_orderkey).select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"
    )
    assert bucketed.count() == plain.count()
    assert bucketed.exceptAll(plain).isEmpty()
    assert plain.exceptAll(bucketed).isEmpty()
