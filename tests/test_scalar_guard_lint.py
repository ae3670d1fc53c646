"""Static lint: driver-side scalars pulled from `.first()` / `.collect()`
must not be coerced with a bare ``int(row[...])`` / ``float(row[...])``.

An aggregate over zero rows yields NULL, so the Row field is None and the
bare coercion raises ``TypeError: int() argument must be ... not
'NoneType'`` — the exact 3 a.m. quiet-hours crash class that
tests/test_empty_inputs.py exists to prevent (and which shipped once, in
round 4's ``corpus_importance_resample``). The dynamic sweep catches it
when run; this lint catches it at commit time with zero Spark startup.

Accepted guard forms (all escape the matcher by construction):
  * ``int(row["x"] or 0)``           — arg is a BoolOp, not a Subscript
  * ``if row is None: return ...``   — coercion sits after an early return,
    but the matcher cannot see control flow, so guard the VALUE instead
    when the source frame can be empty (aggregates); row-existence guards
    (point lookups) should early-return before any subscript.
  * pulling a COUNT(*) — counts are never NULL, but the lint cannot know
    a field's provenance, so spell those ``int(row["n"] or 0)`` too.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(__file__), "..", "cdc_export_system_spark")

_SOURCES = {"first", "collect"}
_COERCERS = {"int", "float"}


def _scan_function(fn: ast.AST) -> list[tuple[int, str]]:
    """Names bound from .first()/.collect() then subscript-coerced bare."""
    row_vars: set[str] = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Call):
            callee = node.value.func
            if isinstance(callee, ast.Attribute) and callee.attr in _SOURCES:
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        row_vars.add(tgt.id)
    if not row_vars:
        return []
    hits: list[tuple[int, str]] = []
    for node in ast.walk(fn):
        if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)):
            continue
        if node.func.id not in _COERCERS or len(node.args) != 1:
            continue
        arg = node.args[0]
        # bare row["k"] / row[0]; `row["k"] or 0` is a BoolOp and passes
        if (
            isinstance(arg, ast.Subscript)
            and isinstance(arg.value, ast.Name)
            and arg.value.id in row_vars
        ):
            hits.append((node.lineno, ast.unparse(node)))
    return hits


def test_no_unguarded_scalar_coercion_from_rows():
    violations: list[str] = []
    for root, dirs, files in os.walk(PKG):
        dirs.sort()
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            tree = ast.parse(open(path).read(), filename=path)
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    for lineno, src in _scan_function(node):
                        rel = os.path.relpath(path, os.path.dirname(PKG))
                        violations.append(f"{rel}:{lineno}: {src}")
    assert not violations, (
        "unguarded int()/float() on a Row field from .first()/.collect() — "
        "NULL aggregate => TypeError on empty input; use `or 0` or an "
        "early-return guard:\n" + "\n".join(violations)
    )
