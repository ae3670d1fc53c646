"""Third-party semantic pins for the round-6 continuation-2 operators.

The DuckDB oracle proves Spark and DuckDB compute the SAME thing; these
tests prove it is the RIGHT thing, by re-deriving each statistic from the
raw parquet with NumPy/pandas (independent code path, textbook formulas).
An identically-wrong formula written into both engines would pass the
oracle hash and fail here.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR

REG = load_all()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


def test_cuped_matches_numpy(spark, events):
    got = {
        r["variant"]: r
        for r in REG["ab_cuped"].fn(spark, SF_DIR).collect()
    }
    ev = events.copy()
    us = ev["ts"].dt.as_unit("us").astype("int64")
    mid = (us.min() + us.max()) // 2
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev = ev.assign(us=us, cents=cents)
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": g.loc[g.us <= mid, "cents"].sum(),
                "y": g.loc[g.us > mid, "cents"].sum(),
            }
        ),
        include_groups=False,
    ).reset_index()
    x, y = per["x"].to_numpy(float), per["y"].to_numpy(float)
    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    arm = np.where(per["user_id"] % 2 == 0, "A", "B")
    for v in ("A", "B"):
        m = arm == v
        exp_mean = (y[m].mean() - theta * (x[m].mean() - x.mean())) / 100
        assert got[v]["mean_y_cuped"] == pytest.approx(exp_mean, abs=2e-6)
        exp_var = (
            np.var(y[m], ddof=1)
            - 2 * theta * np.cov(x[m], y[m], ddof=1)[0, 1]
            + theta**2 * np.var(x[m], ddof=1)
        ) / 10_000
        assert got[v]["var_y_cuped"] == pytest.approx(exp_var, rel=1e-9, abs=2e-6)
        # (no per-arm variance-reduction invariant: theta minimizes the
        # POOLED variance, so a single arm's can legitimately rise)


def test_qini_full_depth_equals_total_uplift(spark, events):
    rows = REG["ml_uplift_qini"].fn(spark, SF_DIR).collect()
    deepest = max(rows, key=lambda r: r["cum_n"])
    per = events.groupby("user_id").agg(
        y=("event_type", lambda s: int((s == "purchase").any())),
    ).reset_index()
    t = (per["user_id"] % 2 == 0).to_numpy()
    yt, yc = per["y"][t].sum(), per["y"][~t].sum()
    nt, nc = int(t.sum()), int((~t).sum())
    exp = (yt * nc - yc * nt) * 1_000_000 // nc
    assert deepest["qini_micro"] == exp
    assert deepest["cum_n"] == nt + nc


def test_spearman_matches_pandas(spark):
    got = REG["stats_spearman_rank"].fn(spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_quantity, l_extendedprice FROM"
        f" read_parquet('{SF_DIR}/lineitem.parquet')"
    ).df()
    x = li["l_quantity"].astype("int64")
    y = np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")
    rho = np.corrcoef(
        pd.Series(x).rank(method="average"), pd.Series(y).rank(method="average")
    )[0, 1]
    assert got["rho"] == pytest.approx(rho, abs=2e-9)
    assert -1 <= got["rho"] <= 1


def test_markov_stationary_sums_to_unit_mass(spark):
    rows = REG["event_markov_stationary_exact"].fn(spark, SF_DIR).collect()
    total = sum(r["pi_micro"] for r in rows)
    # truncating div drops < |states| micro-units per row per squaring and
    # squaring compounds prior loss multiplicatively (~doubles per round):
    # bound = |states| * (2^squarings - 1)
    from cdc_export_system_spark.operators.analytics import MARKOV_SQUARINGS

    assert 0 <= 1_000_000 - total <= len(rows) * (2**MARKOV_SQUARINGS - 1)
    assert all(r["pi_micro"] >= 0 for r in rows)


def test_acf_matches_numpy(spark, events):
    rows = {
        r["lag_hours"]: r["acf"]
        for r in REG["ts_acf_multi_lag"].fn(spark, SF_DIR).collect()
    }
    eh = events["ts"].dt.as_unit("us").astype("int64") // 3_600_000_000
    series = eh.value_counts().sort_index()
    s = series.to_numpy(float)
    idx = series.index.to_numpy()
    mu = s.mean()
    den = ((s - mu) ** 2).sum()
    pos = {int(h): i for i, h in enumerate(idx)}
    for k in (1, 12, 24):
        num = sum(
            (s[i] - mu) * (s[pos[int(h) + k]] - mu)
            for i, h in enumerate(idx)
            if int(h) + k in pos
        )
        assert rows[k] == pytest.approx(num / den, abs=2e-6), k


def test_brown_forsythe_matches_numpy(spark, events):
    got = REG["stats_brown_forsythe"].fn(spark, SF_DIR).collect()[0]
    cents = np.floor(events["value"] * 100 + 0.5).astype("int64")
    g = events.assign(c=cents).groupby("event_type")["c"]
    zs, means, ns = [], [], []
    for _, vals in g:
        v = vals.to_numpy()
        med = np.sort(v)[(len(v) - 1) // 2]  # percentile_disc(0.5): lower middle
        z = np.abs(v - med).astype(float)
        zs.append(z)
        means.append(z.mean())
        ns.append(len(z))
    zbar = np.concatenate(zs).mean()
    k, n = len(zs), sum(ns)
    ssb = sum(ni * (mi - zbar) ** 2 for ni, mi in zip(ns, means))
    ssw = sum(((z - m) ** 2).sum() for z, m in zip(zs, means))
    w = (n - k) / (k - 1) * ssb / ssw
    assert got["w_stat"] == pytest.approx(w, abs=2e-5)
    assert got["df1"] == k - 1 and got["df2"] == n - k


def test_growth_accounting_all_statuses(spark):
    """The growth-accounting ledger on constructed activity exercising
    every status (the parquet testdata spans one month = all 'new'):
    user 1 active months 0,1,3 -> new@0, retained@1, churned@2,
    resurrected@3; user 2 active 0 only -> new@0, churned@1. Also pins
    the identity MAU(t) = new + retained + resurrected."""
    from cdc_export_system_spark.operators.analytics import growth_accounting

    um = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 3), (2, 0)], "user_id long, mi int"
    )
    rows = {
        (r["month"].strftime("%Y-%m"), r["status"]): r["n_users"]
        for r in growth_accounting(um).collect()
    }
    assert rows == {
        ("1970-01", "new"): 2,
        ("1970-02", "retained"): 1,
        ("1970-02", "churned"): 1,
        ("1970-03", "churned"): 1,
        ("1970-04", "resurrected"): 1,
    }


def test_winnowing_guarantee_randomized(spark):
    """Winnowing guarantee over a randomized corpus (fixed seed): 20
    doc pairs with random filler and a shared run of exactly
    WINNOW_K + WINNOW_W - 1 tokens planted at random offsets — every
    pair must share a fingerprint, in one Spark pass."""
    import random

    from cdc_export_system_spark.dedup.substring import (
        WINNOW_K, WINNOW_W, winnow_fingerprints,
    )

    rng = random.Random(20260815)
    run_len = WINNOW_K + WINNOW_W - 1
    rows = []
    for p in range(20):
        run = [f"r{p}_{i}" for i in range(run_len)]
        for side in (0, 1):
            n_pre = rng.randint(0, 30)
            n_post = rng.randint(0, 30)
            toks = (
                [f"f{p}_{side}_{j}" for j in range(n_pre)]
                + run
                + [f"g{p}_{side}_{j}" for j in range(n_post)]
            )
            rows.append((p * 2 + side, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for p in range(20):
        assert by_doc[p * 2] & by_doc[p * 2 + 1], f"pair {p}: no shared fp"


def test_best_window_matches_bruteforce(spark, events):
    """ts_best_window's windowed Kadane must equal the O(n^2) brute
    force over the centered daily sums (same tie-breaks: max gain,
    then earliest end, then earliest start)."""
    got = REG["ts_best_window"].fn(spark, SF_DIR).collect()[0]
    di = events["ts"].dt.as_unit("us").astype("int64") // 86_400_000_000
    cents = np.floor(events["value"] * 100 + 0.5).astype("int64")
    daily = (
        pd.DataFrame({"di": di, "c": cents})
        .groupby("di")["c"].sum().sort_index()
    )
    x = daily.to_numpy(dtype=object)  # exact python ints
    n, s = len(x), int(sum(int(v) for v in x))
    cx = [int(n) * int(v) - s for v in x]
    best = None
    for e in range(1, n + 1):
        acc = 0
        for st in range(e, 0, -1):
            acc += cx[st - 1]
            cand = (acc, -e, -st)
            if best is None or cand > best:
                best = cand
    gain, end_i, start_i = best[0], -best[1], -best[2]
    assert (got["start_idx"], got["end_idx"], got["centered_gain"]) == (
        start_i, end_i, gain,
    )
