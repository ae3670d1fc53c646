"""Accuracy pins for the supervised-ML operators (ml/supervised.py).

The oracle-carrying ops (ml_linear_regression, ml_naive_bayes) get
exact-value DuckDB parity through tests/test_oracle_parity.py like every
other registered query; this file pins the two rows-only ops against
independent NumPy references, plus sanity contracts the SQL oracles
can't express (classifier accuracy, regression residual structure).
"""

from __future__ import annotations

import numpy as np
import pytest

from cdc_export_system_spark.ml.supervised import (
    GD_ITERS,
    GD_LR,
    NANO,
    RIDGE_LAMBDA,
    _EVENT_TYPES,
    ml_linear_regression,
    ml_logistic_regression_gd,
    ml_naive_bayes,
    ml_ridge_normal_eq,
)
from tests.conftest import SF_DIR


def test_logistic_gd_matches_numpy_replay(spark):
    """The distributed GD trajectory is bit-identical to a local NumPy
    replay using the same per-row 1e-9 gradient rounding — proving the
    integer-sum determinism contract, not just 'close enough'."""
    import pandas as pd

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    x = np.stack(
        [
            np.ones(len(li)),
            li["l_quantity"].to_numpy() / 50.0,
            li["l_discount"].to_numpy() * 10.0,
        ],
        axis=1,
    )
    y = (li["l_returnflag"] == "R").to_numpy().astype(np.float64)
    n = len(li)
    w = np.zeros(3)
    for _ in range(GD_ITERS):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        err = p - y
        g = np.array(
            [np.sum(np.floor(err * x[:, j] * NANO + 0.5)) for j in range(3)]
        )
        w = w - GD_LR * (g / NANO) / n
    acc = float(np.mean(((x @ w) > 0).astype(np.float64) == y))

    got = {r["term"]: r["value"] for r in ml_logistic_regression_gd(spark, SF_DIR).collect()}
    assert got["w_bias"] == round(w[0], 9)
    assert got["w_qty"] == round(w[1], 9)
    assert got["w_disc"] == round(w[2], 9)
    assert got["train_accuracy"] == round(acc, 6)
    assert got["n"] == float(n)


def test_logistic_gd_learns_signal(spark):
    """The returnflag base rate is ~25%; a useful fit must beat the
    majority-class accuracy floor at least marginally and move weights
    off the origin."""
    got = {r["term"]: r["value"] for r in ml_logistic_regression_gd(spark, SF_DIR).collect()}
    assert got["train_accuracy"] >= 0.5
    assert any(abs(got[k]) > 1e-6 for k in ("w_bias", "w_qty", "w_disc"))


def test_ridge_matches_numpy_reference(spark):
    """Driver-solved coefficients equal the straight NumPy normal-
    equations solution on the same design matrix (float tolerance: the
    partial sums may associate differently)."""
    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    hour = ev["ts"].dt.hour.to_numpy() / 24.0
    # Spark dayofweek: Sunday=1..Saturday=7; pandas dayofweek: Monday=0
    dow = ((ev["ts"].dt.dayofweek.to_numpy() + 1) % 7 + 1) / 7.0
    cols = [np.ones(len(ev)), hour, dow] + [
        (ev["event_type"] == t).to_numpy().astype(np.float64) for t in _EVENT_TYPES
    ]
    x = np.stack(cols, axis=1)
    y = ev["value"].to_numpy()
    k = x.shape[1]
    w_ref = np.linalg.solve(x.T @ x + RIDGE_LAMBDA * np.eye(k), x.T @ y)
    sse = float(y @ y) - 2 * float(w_ref @ (x.T @ y)) + float(w_ref @ (x.T @ x) @ w_ref)
    rmse_ref = float(np.sqrt(max(sse, 0.0) / len(ev)))

    got = {r["term"]: r["value"] for r in ml_ridge_normal_eq(spark, SF_DIR).collect()}
    names = ["w_b", "w_f_hour", "w_f_dow"] + [f"w_f_{t}" for t in _EVENT_TYPES]
    for name, ref in zip(names, w_ref):
        assert got[name] == pytest.approx(float(ref), abs=1e-6), name
    assert got["train_rmse"] == pytest.approx(rmse_ref, abs=1e-4)
    assert got["n"] == float(len(ev))


def test_naive_bayes_learns_on_signal_bearing_corpus(spark):
    """The testdata's lang label is independent of its shared 31-token
    vocabulary (chance accuracy by construction), so the learning
    contract is pinned on a constructed corpus with real class signal:
    each lang has a distinctive token mixed with shared filler. NB must
    classify the held-out docs near-perfectly AND beat the prior."""
    from cdc_export_system_spark.ml.supervised import naive_bayes_classify

    langs = {"en": "hello", "de": "hallo", "fr": "bonjour"}
    rows = []
    i = 0
    for lang, marker in langs.items():
        for _ in range(30):
            # filler is class-independent; marker appears 3x per doc
            rows.append((i, lang, f"{marker} data table {marker} row {marker}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    train = df.filter(df.doc_id % 3 != 0)
    test = df.filter(df.doc_id % 3 == 0)
    out = naive_bayes_classify(train, test).collect()
    assert out
    acc = sum(1 for r in out if r["correct"]) / len(out)
    assert acc == 1.0, [(r["doc_id"], r["lang_actual"], r["lang_pred"]) for r in out]


def test_naive_bayes_testdata_runs_and_scores_every_doc(spark):
    """On the real testdata the pin is structural: every held-out doc
    gets a prediction (full vocab overlap), scores are finite negatives,
    and the prediction set stays within the training classes."""
    rows = ml_naive_bayes(spark, SF_DIR).collect()
    assert rows, "held-out fold is empty"
    langs = {"en", "de", "fr", "es", "zh"}
    for r in rows:
        assert r["lang_pred"] is not None
        assert r["lang_pred"] in langs
        assert r["score"] < 0.0


def test_linear_regression_r2_bounds(spark):
    """R² ∈ [0, 1] for every group and n matches the table row counts —
    structure the hash oracle checks only indirectly."""
    rows = ml_linear_regression(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0, r
        assert r["n"] >= 2
