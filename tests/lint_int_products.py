"""Static lint for BIGINT-product overflow risk (VERDICT r07 item 2).

The `metric_concentration_shares` overflow (cumulative cents * 1e6
exceeding int64 only past ~9.2e12 total cents, i.e. at sf1) shipped
because no static check walks the plans for integer products that grow
with data volume. This module reconstructs every registered query's
OPTIMIZED logical plan from Spark's flat ``toJSON`` encoding, infers
expression result types bottom-up, and flags every ``Multiply`` whose
result stays integral (long) and whose operands can be data-scaled:

* ``big-literal``: long-multiply with a literal factor >= LIT_BOUND —
  the `cents_sum * 1_000_000` class (3+ decimal orders of headroom gone
  in one hop);
* ``col-x-col``: long-multiply of two non-literal operands — the
  counts-squared / cents-x-counts class whose bound is the product of
  two data-dependent magnitudes;
* ``shiftleft``: any ``ShiftLeft`` — 2^k weights wrap silently past
  k=62 unless k is guarded.

A flag is not a failure by itself: `tests/test_int_product_lint.py`
holds the audited allowlist (site + justification: proven magnitude
bound, guard, or epoch/id arithmetic that cannot scale with volume).
Any NEW unreviewed long product anywhere in the 453-query registry
fails the sweep until it is either rewritten in DECIMAL(38,0) (the
concentration-shares treatment) or consciously allowlisted.
"""

from __future__ import annotations

import json
from typing import Any

LIT_BOUND = 1000  # literal factor that eats >= 3 decimal orders of headroom

_INTEGRAL = {"tinyint", "smallint", "integer", "long"}
_RANK = {"tinyint": 0, "smallint": 1, "integer": 2, "long": 3}

# expression classes whose result type equals a fixed type
_FIXED_TYPE = {
    "Count": "long",
    "UnixMicros": "long",
    "UnixMillis": "long",
    "UnixSeconds": "long",
    "UnixTimestamp": "long",
    "Crc32": "long",
    "XxHash64": "long",
    "RowNumber": "integer",
    "Rank": "integer",
    "DenseRank": "integer",
    "NTile": "integer",
    "Size": "integer",
    "Length": "integer",
    "Levenshtein": "integer",
    "Ascii": "integer",
    "Murmur3Hash": "integer",
    "DayOfMonth": "integer",
    "DayOfYear": "integer",
    "DayOfWeek": "integer",
    "WeekDay": "integer",
    "Hour": "integer",
    "Minute": "integer",
    "Second": "integer",
    "Month": "integer",
    "Year": "integer",
    "Quarter": "integer",
    "DateDiff": "integer",
    "PercentRank": "double",
    "CumeDist": "double",
    "Average": "double",
    "StddevSamp": "double",
    "StddevPop": "double",
    "VarianceSamp": "double",
    "VariancePop": "double",
    "Corr": "double",
    "CovSample": "double",
    "CovPopulation": "double",
    "Skewness": "double",
    "Kurtosis": "double",
    "Pow": "double",
    "Logarithm": "double",
    "Log": "double",
    "Ln": "double",
    "Log2": "double",
    "Log10": "double",
    "Exp": "double",
    "Sqrt": "double",
    "Cbrt": "double",
    "Rand": "double",
    "Randn": "double",
    "HyperLogLogPlusPlus": "long",
    "ApproxCountDistinctForIntervals": "long",
    "BitwiseCount": "integer",
}

# classes transparent to their (single relevant) child's type
_PASSTHROUGH = {
    "Alias",
    "AggregateExpression",
    "Sum",  # Spark: sum(long) -> long (exactly the overflow class)
    "Min",
    "Max",
    "First",
    "Last",
    "Lag",
    "Lead",
    "WindowExpression",
    "UnaryMinus",
    "Abs",
    "UnaryPositive",
    "PromotePrecision",
    "CheckOverflow",
    "KnownNotNull",
    "AssertTrue",
    "TaggingExpression",
    "SortOrder",
    "NthValue",
    "AnyValue",
    "Mode",
}


def iter_expression_lists(obj: Any):
    """Yield every flat pre-order expression list in a plan-JSON value."""
    if isinstance(obj, dict):
        for v in obj.values():
            yield from iter_expression_lists(v)
    elif isinstance(obj, list):
        if obj and isinstance(obj[0], dict) and "class" in obj[0] \
                and "num-children" in obj[0]:
            yield obj
        else:
            for v in obj:
                yield from iter_expression_lists(v)


def build_tree(nodes: list[dict], i: int = 0):
    """Reconstruct one expression tree from the flat pre-order list."""
    node = nodes[i]
    n = int(node.get("num-children", 0))
    children = []
    i += 1
    for _ in range(n):
        child, i = build_tree(nodes, i)
        children.append(child)
    return (node, children), i


def build_forest(nodes: list[dict]):
    out, i = [], 0
    while i < len(nodes):
        tree, i = build_tree(nodes, i)
        out.append(tree)
    return out


def simple_class(node: dict) -> str:
    return node.get("class", "").rsplit(".", 1)[-1]


def infer_type(tree) -> str:
    """Bottom-up result-type inference over the reconstructed tree.

    Returns a Spark simpleString type or "unknown". Over-approximation
    is fine — the consumer only distinguishes integral vs not.
    """
    node, children = tree
    cls = simple_class(node)
    dt = node.get("dataType")
    if isinstance(dt, str):  # AttributeReference, Literal, Cast, ...
        return dt
    if cls in _FIXED_TYPE:
        return _FIXED_TYPE[cls]
    child_types = [infer_type(c) for c in children]
    if cls in _PASSTHROUGH:
        for t in child_types:
            if t not in ("unknown", "boolean", "null"):
                return t
        return "unknown"
    if cls in ("Floor", "Ceil"):
        # floor/ceil of double is LONG; of decimal stays decimal
        for t in child_types:
            if t.startswith("decimal"):
                return t
        return "long"
    if cls == "Divide":
        # Spark's `/` on integral inputs is double (analyzer casts);
        # decimal/decimal stays decimal
        if any(t.startswith("decimal") for t in child_types):
            return "decimal"
        return "double"
    if cls in ("IntegralDivide",):
        return "long"
    if cls in ("ShiftLeft", "ShiftRight", "ShiftRightUnsigned"):
        return child_types[0] if child_types else "long"
    # generic numeric promotion (Add/Subtract/Multiply/Remainder/Pmod/
    # Greatest/Least/CaseWhen/Coalesce/If and anything unknown)
    best = "unknown"
    for t in child_types:
        if t == "double" or t == "float":
            return "double"
        if t.startswith("decimal"):
            best = t
        elif t in _INTEGRAL and not best.startswith("decimal"):
            if best == "unknown" or (
                best in _INTEGRAL and _RANK[t] > _RANK[best]
            ):
                best = t
    return best


def _literal_value(tree):
    node, _ = tree
    if simple_class(node) == "Literal":
        dt = node.get("dataType")
        if dt in _INTEGRAL:
            try:
                return int(node.get("value"))
            except (TypeError, ValueError):
                return None
    return None


INT64_MAX = (1 << 63) - 1


def abs_bound(tree):
    """Provable bound on |expr|, or None. Propagates through literals,
    modulus reductions (x % m and pmod bound the result by |m|-1 no
    matter what x is), bit masks, casts, and +,-,* — enough to clear
    the `(key % 2^31) * KNUTH` folded-hash idiom automatically while
    leaving genuinely data-scaled magnitudes unbounded."""
    node, children = tree
    cls = simple_class(node)
    if cls == "Literal":
        v = _literal_value(tree)
        return None if v is None else abs(v)
    if cls in ("Pmod", "Remainder") and len(children) == 2:
        m = _literal_value(children[1])
        if m is not None and m != 0:
            return abs(m) - 1
        return None
    if cls == "BitwiseAnd" and len(children) == 2:
        m = _literal_value(children[1])
        if m is not None and m >= 0:
            return m
        m = _literal_value(children[0])
        if m is not None and m >= 0:
            return m
        return None
    if cls in ("Cast", "CheckOverflow", "PromotePrecision", "Alias",
               "KnownNotNull", "UnaryMinus", "Abs", "UnaryPositive"):
        return abs_bound(children[0]) if children else None
    if cls in ("Add", "Subtract") and len(children) == 2:
        a, b = abs_bound(children[0]), abs_bound(children[1])
        return None if a is None or b is None else a + b
    if cls == "Multiply" and len(children) == 2:
        a, b = abs_bound(children[0]), abs_bound(children[1])
        return None if a is None or b is None else a * b
    return None


def _has_nonliteral(tree) -> bool:
    node, children = tree
    cls = simple_class(node)
    if cls == "Literal":
        return False
    if cls == "AttributeReference":
        return True
    if not children:
        return cls not in ("Literal",)
    return any(_has_nonliteral(c) for c in children)


def scan_tree(tree, flags: list[dict]) -> None:
    node, children = tree
    cls = simple_class(node)
    if cls == "Multiply":
        t = infer_type(tree)
        if t in _INTEGRAL and len(children) == 2:
            # a provable product bound under int64 clears the multiply
            ba, bb = abs_bound(children[0]), abs_bound(children[1])
            proven = ba is not None and bb is not None and ba * bb <= INT64_MAX
            lv = [_literal_value(c) for c in children]
            nonlit = [_has_nonliteral(c) for c in children]
            big_lit = any(v is not None and abs(v) >= LIT_BOUND for v in lv)
            if not proven:
                if big_lit and any(nonlit):
                    flags.append({"kind": "big-literal", "type": t,
                                  "lits": [v for v in lv if v is not None]})
                elif all(nonlit):
                    flags.append({"kind": "col-x-col", "type": t})
    elif cls == "ShiftLeft":
        flags.append({"kind": "shiftleft", "type": infer_type(tree)})
    for c in children:
        scan_tree(c, flags)


def scan_plan_json(plan_json: str) -> list[dict]:
    """All integer-product risk flags in one plan's toJSON output.

    ``toJSON`` encodes the PLAN itself as a flat pre-order list of
    plan-node dicts (same num-children scheme as expressions), so the
    walk iterates each plan node's FIELDS — expression trees live in
    fields like ``aggregateExpressions`` / ``projectList`` as (lists
    of) flat expression lists."""
    plan = json.loads(plan_json)
    flags: list[dict] = []
    for pnode in plan if isinstance(plan, list) else [plan]:
        if not isinstance(pnode, dict):
            continue
        for key, val in pnode.items():
            if key in ("class", "num-children"):
                continue
            for nodes in iter_expression_lists(val):
                try:
                    forest = build_forest(nodes)
                except (IndexError, KeyError, ValueError):
                    continue
                for tree in forest:
                    scan_tree(tree, flags)
    return flags


def scan_df(df) -> list[dict]:
    return scan_plan_json(df._jdf.queryExecution().optimizedPlan().toJSON())
