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
