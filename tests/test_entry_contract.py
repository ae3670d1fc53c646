"""Driver-contract pins for __spark_entry__.py.

The correctness driver consumes a ~50-entry prefix of ``queries()``; the
rotation machinery that orders it must never silently decay: a typo in
``_PRIORITY`` is filtered out without error (the name simply never gets
driver coverage), and an oracle_sql() key that isn't in queries() would
crash the driver. These pins make both failure modes loud.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

from cdc_export_system_spark.registry import load_all  # noqa: E402

REGISTRY = load_all()


def test_priority_names_all_registered():
    unknown = [n for n in entry._PRIORITY if n not in REGISTRY]
    assert not unknown, f"_PRIORITY names not in the registry: {unknown}"
    unknown = [n for n in entry._RECHECK if n not in REGISTRY]
    assert not unknown, f"_RECHECK names not in the registry: {unknown}"


def test_priority_has_no_duplicates():
    for lst, label in ((entry._PRIORITY, "_PRIORITY"),
                       (entry._RECHECK, "_RECHECK")):
        seen: set[str] = set()
        dupes = []
        for n in lst:
            if n in seen:
                dupes.append(n)
            seen.add(n)
        assert not dupes, f"duplicate {label} entries: {dupes}"


def test_recheck_block_leads_green_tail():
    """The driver's ~50-slot prefix must reach every optimization-
    touched query this round: after the never-checked block, the next
    entries are exactly the registered _RECHECK names, in order."""
    checked = _driver_green() & set(REGISTRY)
    order = list(entry.queries())
    expected = [n for n in entry._RECHECK if n in checked]
    first_checked = min(
        (i for i, n in enumerate(order) if n in checked), default=None
    )
    if first_checked is None or not expected:
        return
    got = order[first_checked:first_checked + len(expected)]
    assert got == expected


def test_queries_and_oracles_align():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) == set(REGISTRY)
    assert len(q) == len(REGISTRY)


def _driver_green() -> set[str]:
    """Same green predicate as entry._round_order."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                green = row.get("hash_match") is True or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if green:
                    checked.add(name)
    return checked


def test_round_order_puts_unchecked_first():
    """Entries already driver-green must sort after every never-checked
    entry, so the driver's ~50-entry prefix always lands on fresh
    queries."""
    checked = _driver_green() & set(REGISTRY)
    order = list(entry.queries())
    if not checked or len(checked) == len(order):
        return
    last_unchecked = max(i for i, n in enumerate(order) if n not in checked)
    first_checked = min(i for i, n in enumerate(order) if n in checked)
    assert first_checked > last_unchecked
