"""docs/OPERATORS.md is generated from the registry; this pins it fresh —
adding an operator without re-running scripts/gen_operator_index.py fails
here, not in a stale doc a reader trusts."""

from __future__ import annotations

import os

from cdc_export_system_spark.registry import load_all

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "OPERATORS.md")


def test_operator_index_names_every_registered_op():
    text = open(DOC).read()
    missing = [n for n in load_all() if f"`{n}`" not in text]
    assert not missing, f"regenerate docs/OPERATORS.md: missing {missing}"


def test_operator_index_counts_match():
    registry = load_all()
    text = open(DOC).read()
    assert f"**{len(registry)} operators**" in text, "regenerate docs/OPERATORS.md"


PLAN_DOC = os.path.join(os.path.dirname(DOC), "PLAN_METRICS.md")


def test_plan_metrics_names_every_headline_op():
    """docs/PLAN_METRICS.md is the machine-noise-free regression signal;
    a headline op added without re-running scripts/gen_plan_metrics.py
    fails here, not in a silently stale table."""
    text = open(PLAN_DOC).read()
    missing = [
        n for n, spec in load_all().items() if spec.headline and f"`{n}`" not in text
    ]
    assert not missing, f"regenerate docs/PLAN_METRICS.md: missing {missing}"


def test_plan_metrics_counts_match():
    n_headline = sum(1 for spec in load_all().values() if spec.headline)
    text = open(PLAN_DOC).read()
    assert f"**{n_headline} headline queries**" in text, (
        "regenerate docs/PLAN_METRICS.md"
    )
