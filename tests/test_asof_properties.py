"""Property-based pins for the hand-built as-of join family: for
arbitrary small event populations (including same-timestamp collisions,
users with only left rows, only right rows, or neither), the union +
running-extrema window composition must equal the brute-force definition:

  backward:  argmax_{r.ts <= l.ts} (r.ts, r.id)
  forward:   argmin_{r.ts >= l.ts} (r.ts, r.id)    [min id at equal ts]
  nearest:   the closer of the two, ties to backward

The window form is what scales (one sort per key, no inequality join);
the brute force is the spec. Hypothesis drives the collisions that the
seeded fixtures rarely produce."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from cdc_export_system_spark.operators.asof import asof_join, asof_join_forward

BASE = datetime(2024, 1, 1)

# (user_id in 0..2, offset_s in a SMALL range so equal timestamps happen,
#  is_right) — ids are assigned sequentially so they are unique
ev_st = st.tuples(st.integers(0, 2), st.integers(0, 8), st.booleans())
pop_st = st.lists(ev_st, min_size=0, max_size=14)

PROP_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def split_population(spark, pop):
    lefts, rights = [], []
    for i, (uid, off, is_right) in enumerate(pop):
        row = (i, uid, BASE + timedelta(seconds=off))
        (rights if is_right else lefts).append(row)
    return (
        spark.createDataFrame(lefts, SCHEMA),
        spark.createDataFrame(rights, SCHEMA),
        lefts,
        rights,
    )


def brute_backward(lefts, rights):
    out = {}
    for lid, luid, lts in lefts:
        cands = [(rts, rid) for rid, ruid, rts in rights if ruid == luid and rts <= lts]
        out[lid] = max(cands) if cands else None
    return out


def brute_forward(lefts, rights):
    out = {}
    for lid, luid, lts in lefts:
        cands = [(rts, rid) for rid, ruid, rts in rights if ruid == luid and rts >= lts]
        out[lid] = min(cands) if cands else None
    return out


def collect_matches(df):
    return {
        r.event_id: (None if r.matched_ts is None else (r.matched_ts, r.matched_id))
        for r in df.collect()
    }


@given(pop=pop_st)
@PROP_SETTINGS
def test_asof_backward_equals_brute_force(spark, pop):
    left, right, lefts, rights = split_population(spark, pop)
    got = collect_matches(asof_join(left, right, "user_id", "ts", "ts", "event_id"))
    assert got == brute_backward(lefts, rights)


@given(pop=pop_st)
@PROP_SETTINGS
def test_asof_forward_equals_brute_force(spark, pop):
    left, right, lefts, rights = split_population(spark, pop)
    got = collect_matches(
        asof_join_forward(left, right, "user_id", "ts", "ts", "event_id")
    )
    assert got == brute_forward(lefts, rights)
