"""Static lint for BIGINT-product overflow risk in ORACLE SQL (VERDICT r08 item 4).

`tests/lint_int_products.py` proves the Spark side of every registered
query keeps volume-scaled integer products out of bare int64 arithmetic.
The DuckDB oracle texts got their HUGEINT casts by convention, not by
lint — so "the engines fail differently near the bound" (the r07 EWMA
class) could re-enter through a future oracle edit: DuckDB throws a
runtime overflow error on a BIGINT*BIGINT product past 2^63, at a data
scale the sf0.01 driver run never reaches.

This module is the oracle-side ratchet. It parses every registered
query's oracle SQL with DuckDB's own parser (``json_serialize_sql``),
runs a bottom-up type inference over the AST — base column types come
from the real parquet schemas, operator/function result types from
typed-NULL/typed-literal probes against the same DuckDB that runs the
oracles, so the inference matches the engine's binder exactly — and
flags:

* ``big-literal``: integral multiply with a constant factor >= LIT_BOUND
  (mirrors the Spark lint's `cents_sum * 1_000_000` class);
* ``col-x-col``: integral multiply of two non-constant operands;
* ``shiftleft``: any ``<<`` (wraps silently past the width);
* ``unknown-type``: a multiply whose operand type the inferencer could
  not resolve — treated as a lint failure so inference gaps surface as
  loudly as real flags rather than passing silently.

A flag is not a failure by itself: `tests/test_oracle_product_lint.py`
holds the audited allowlist (site + justification, mirroring the
Spark-side allowlist — the same math appears on both engines). Any NEW
un-reviewed integral product in any oracle fails the sweep until it is
rewritten with an explicit HUGEINT/DECIMAL operand cast or consciously
allowlisted with a written magnitude bound.

Scope notes. Multiplies are collected from every expression position
(select list, WHERE/HAVING/QUALIFY, join conditions, GROUP BY, window
partition/order/frame args, ORDER BY modifiers, lambda bodies, VALUES
lists, correlated subqueries). DuckDB's `/` is float division (DOUBLE),
`//` and `%` stay integral, and SUM over integers auto-promotes to
HUGEINT — all of which the probes capture directly instead of
re-encoding by hand.
"""

from __future__ import annotations

import functools
import json
from typing import Any

import duckdb

LIT_BOUND = 1000  # mirror tests/lint_int_products.py

_INTEGRAL = {"int8", "int16", "int32", "uint32", "int64", "uint64"}

# duckdb type-name -> lattice
_DUCK_TO_LATTICE = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "INT": "int32",
    "UINTEGER": "uint32",
    "BIGINT": "int64",
    "INT8": "int64",
    "UBIGINT": "uint64",
    "HUGEINT": "hugeint",
    "UHUGEINT": "hugeint",
    "DOUBLE": "double",
    "FLOAT": "double",
    "REAL": "double",
    "DECIMAL": "decimal",
    "VARCHAR": "varchar",
    "CHAR": "varchar",
    "TEXT": "varchar",
    "BLOB": "blob",
    "BOOLEAN": "bool",
    "BOOL": "bool",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "DATE": "date",
    "TIME": "time",
    "INTERVAL": "interval",
    "NULL": "null",
    "SQLNULL": "null",
    "UNKNOWN": "unknown",
    "BIT": "bit",
    "UUID": "varchar",
    "JSON": "varchar",
}

# lattice -> duckdb SQL type text (for typed-NULL probes)
_LATTICE_TO_DUCK = {
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INTEGER",
    "uint32": "UINTEGER",
    "int64": "BIGINT",
    "uint64": "UBIGINT",
    "hugeint": "HUGEINT",
    "double": "DOUBLE",
    "decimal": "DECIMAL(18,6)",
    "varchar": "VARCHAR",
    "blob": "BLOB",
    "bool": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "time": "TIME",
    "interval": "INTERVAL",
    "bit": "BIT",
    "null": "INTEGER",  # NULL literal binds as INTEGER in most overloads
}

# window specials that a typed-NULL probe cannot reach
_WINDOW_FIXED = {
    "WINDOW_ROW_NUMBER": "int64",
    "WINDOW_RANK": "int64",
    "WINDOW_RANK_DENSE": "int64",
    "WINDOW_NTILE": "int64",
    "WINDOW_PERCENT_RANK": "double",
    "WINDOW_CUME_DIST": "double",
}
_WINDOW_PASSTHROUGH = {
    "WINDOW_LAG",
    "WINDOW_LEAD",
    "WINDOW_FIRST_VALUE",
    "WINDOW_LAST_VALUE",
    "WINDOW_NTH_VALUE",
}


class Flag:
    __slots__ = ("kind", "site")

    def __init__(self, kind: str, site: str):
        self.kind = kind
        self.site = site

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Flag({self.kind}: {self.site})"


def _render_type(t: Any) -> str | None:
    """Lattice type -> DuckDB SQL type text, or None if unprobeable."""
    if isinstance(t, str):
        return _LATTICE_TO_DUCK.get(t)
    if isinstance(t, tuple):
        if t[0] == "list":
            inner = _render_type(t[1])
            return f"{inner}[]" if inner else None
        if t[0] == "struct":
            parts = []
            for name, ft in t[1]:
                ftxt = _render_type(ft)
                if ftxt is None:
                    return None
                parts.append(f'"{name}" {ftxt}')
            return "STRUCT(" + ", ".join(parts) + ")"
    return None


class OracleTyper:
    """Bottom-up type inference + integral-product flagging for one SQL text."""

    def __init__(self, con: duckdb.DuckDBPyConnection, base_schemas: dict):
        self.con = con
        self.base = base_schemas  # table -> list[(col, lattice_type)]
        self.flags: list[Flag] = []
        self.unresolved: list[str] = []

    # ---------- DuckDB probes (cached per connection via module cache) ----

    def _probe(self, sql: str) -> Any:
        try:
            name = self.con.execute(f"SELECT typeof({sql})").fetchone()[0]
        except Exception:
            return "unknown"
        return self._parse_duck_typename(name)

    def _parse_duck_typename(self, name: str) -> Any:
        name = name.strip().strip('"')
        if name.endswith("[]"):
            return ("list", self._parse_duck_typename(name[:-2]))
        if name.startswith("STRUCT("):
            # field parse: good enough for probe results we generate
            inner = name[7:-1]
            depth = 0
            cur = ""
            parts = []
            for ch in inner:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    parts.append(cur)
                    cur = ""
                else:
                    cur += ch
            if cur.strip():
                parts.append(cur)
            fields = []
            for p in parts:
                p = p.strip()
                fname, _, ftype = p.partition(" ")
                fields.append((fname.strip('"'), self._parse_duck_typename(ftype)))
            return ("struct", tuple(fields))
        if name.startswith("DECIMAL"):
            return "decimal"
        if name.startswith("MAP") or name.startswith("UNION"):
            return "unknown"
        return _DUCK_TO_LATTICE.get(name, "unknown")

    def _fn_type(self, fn: str, arg_types: list[Any], arg_lits: list | None = None) -> Any:
        """Probe fn's result type. Constant args are probed as literals so
        overloads that require constants (quantile fractions, list_aggregate
        names, date_part specifiers) bind the way the real oracle binds."""
        rendered = []
        for i, t in enumerate(arg_types):
            lit = arg_lits[i] if arg_lits else None
            rendered.append((_render_type(t), lit))
        return _fn_type_cached(fn, tuple(rendered))

    # --------------------------- rendering --------------------------------

    def _render(self, e: dict) -> str:
        cls = e.get("class")
        if cls == "COLUMN_REF":
            return ".".join(e.get("column_names", ["?"]))
        if cls == "CONSTANT":
            return str(e.get("value", {}).get("value", "NULL"))
        if cls == "CAST":
            return f"CAST({self._render(e['child'])} AS {e['cast_type'].get('id')})"
        if cls == "FUNCTION":
            ch = [self._render(c) for c in e.get("children", [])]
            name = e.get("function_name", "?")
            if e.get("is_operator") and len(ch) == 2:
                return f"({ch[0]} {name} {ch[1]})"
            return f"{name}({', '.join(ch)})"
        if cls == "WINDOW":
            ch = [self._render(c) for c in e.get("children", [])]
            return f"{e.get('function_name','?')}({', '.join(ch)}) OVER (...)"
        if cls == "CASE":
            return "CASE ... END"
        if cls == "OPERATOR":
            ch = [self._render(c) for c in e.get("children", [])]
            return f"{e.get('type','OP')}({', '.join(ch)})"
        if cls == "LAMBDA":
            return f"(... -> {self._render(e.get('expr', {}))})"
        return str(cls)

    _LIT_PROBE_TYPES = {"int8", "int16", "int32", "int64", "decimal",
                        "double", "varchar", "bool"}

    def _lit_for_probe(self, e: dict, t: Any) -> Any:
        """Constant value usable as a literal probe argument. Temporal /
        interval / list constants probe as typed NULLs instead — their
        serialized constant values don't round-trip to SQL literal text."""
        if not (isinstance(t, str) and t in self._LIT_PROBE_TYPES):
            return None
        return self._const_value(e)

    # ------------------------ constant folding ----------------------------

    def _const_value(self, e: dict) -> int | float | str | None:
        cls = e.get("class")
        if cls == "CONSTANT":
            v = e.get("value", {}).get("value")
            t = e.get("value", {}).get("type", {}).get("id", "")
            if t == "DECIMAL":
                scale = e["value"]["type"].get("type_info", {}).get("scale", 0)
                try:
                    return v / (10**scale)
                except TypeError:
                    return None
            if isinstance(v, (int, float, str)):
                return v
            return None
        if cls == "CAST":
            return self._const_value(e["child"])
        if cls == "FUNCTION" and e.get("function_name") in ("-", "+", "*"):
            kids = e.get("children", [])
            vals = [self._const_value(k) for k in kids]
            if any(not isinstance(v, (int, float)) for v in vals):
                return None
            if e["function_name"] == "-":
                return -vals[0] if len(vals) == 1 else vals[0] - vals[1]
            if e["function_name"] == "+":
                return vals[0] if len(vals) == 1 else vals[0] + vals[1]
            out = 1
            for v in vals:
                out *= v
            return out
        return None

    # --------------------------- environments -----------------------------
    # env: {"map": {name|qual.name: type}, "cols": ordered [(name, type)]}

    def _env_lookup(self, envs: list, name_parts: list[str]) -> Any:
        qual = ".".join(name_parts)
        bare = name_parts[-1]
        for env in envs:
            d = env["map"]
            if qual in d:
                return d[qual]
            if len(name_parts) > 1:
                # struct field access: resolve prefix then walk fields
                pref = ".".join(name_parts[:-1])
                base_t = d.get(pref)
                if isinstance(base_t, tuple) and base_t[0] == "struct":
                    for fname, ftype in base_t[1]:
                        if fname == bare:
                            return ftype
            if bare in d:
                return d[bare]
        return None

    @staticmethod
    def _mk_env(cols: list, prefix: str | None = None) -> dict:
        m: dict[str, Any] = {}
        ordered = []
        for name, t in cols:
            if name not in m:
                ordered.append((name, t))
            m[name] = t
            if prefix:
                m[f"{prefix}.{name}"] = t
        return {"map": m, "cols": ordered}

    # ----------------------------- queries --------------------------------

    def infer_statement(self, node: dict, ctes: dict, outer: list) -> list:
        """Return ordered [(name, type)] for a query node."""
        ntype = node.get("type")
        if ntype == "SELECT_NODE":
            return self._infer_select(node, ctes, outer)
        if ntype == "SET_OPERATION_NODE":
            ctes = self._with_ctes(node, ctes, outer)
            left = self.infer_statement(node["left"], ctes, outer)
            right = self.infer_statement(node["right"], ctes, outer)
            out = []
            for i, (name, t) in enumerate(left):
                rt = right[i][1] if i < len(right) else "unknown"
                out.append((name, self._promote(t, rt)))
            return out
        if ntype == "RECURSIVE_CTE_NODE":
            ctes = self._with_ctes(node, ctes, outer)
            anchor = self.infer_statement(node["left"], ctes, outer)
            ctes2 = dict(ctes)
            ctes2[node["cte_name"]] = anchor
            self.infer_statement(node["right"], ctes2, outer)  # flags inside
            if node.get("child"):
                return self.infer_statement(node["child"], ctes2, outer)
            return anchor
        if ntype == "CTE_NODE":
            ctes = self._with_ctes(node, ctes, outer)
            out_cols = self.infer_statement(node["query"], ctes, outer)
            ctes2 = dict(ctes)
            ctes2[node["cte_name"]] = out_cols
            return self.infer_statement(node["child"], ctes2, outer)
        self.unresolved.append(f"query-node:{ntype}")
        return []

    def _with_ctes(self, node: dict, ctes: dict, outer: list) -> dict:
        cte_map = node.get("cte_map") or {}
        entries = cte_map.get("map") or []
        out = dict(ctes)
        for ent in entries:
            name = ent["key"]
            q = ent["value"]["query"]["node"]
            cols = self.infer_statement(q, out, outer)
            aliases = ent["value"].get("aliases") or []
            if aliases:
                cols = [
                    (aliases[i] if i < len(aliases) else c[0], c[1])
                    for i, c in enumerate(cols)
                ]
            out[name] = cols
        return out

    def _infer_select(self, node: dict, ctes: dict, outer: list) -> list:
        ctes = self._with_ctes(node, ctes, outer)
        from_env = self._resolve_from(node.get("from_table"), ctes, outer)
        envs = [from_env] + outer

        # lateral select-alias reuse (duckdb allows it)
        alias_map: dict[str, Any] = {}
        env_with_alias = [{"map": alias_map, "cols": []}] + envs

        out_cols: list = []
        for e in node.get("select_list", []):
            if e.get("class") == "STAR":
                excl = {
                    x.lower()
                    for x in (e.get("exclude_list") or [])
                    if isinstance(x, str)
                }
                for name, t in from_env["cols"]:
                    if name.lower() not in excl:
                        out_cols.append((name, t))
                continue
            t = self.type_expr(e, env_with_alias, ctes)
            name = e.get("alias")
            if not name:
                if e.get("class") == "COLUMN_REF":
                    name = e["column_names"][-1]
                else:
                    name = self._render(e)
            alias_map[name] = t
            out_cols.append((name, t))

        for key in ("where_clause", "having", "qualify"):
            if node.get(key):
                self.type_expr(node[key], env_with_alias, ctes)
        for g in node.get("group_expressions") or []:
            self.type_expr(g, env_with_alias, ctes)
        for mod in node.get("modifiers") or []:
            for o in mod.get("orders") or []:
                if "expression" in o:
                    self.type_expr(o["expression"], env_with_alias, ctes)
            for key in ("limit", "offset"):
                if mod.get(key):
                    self.type_expr(mod[key], env_with_alias, ctes)
            for d in mod.get("distinct_on_targets") or []:
                self.type_expr(d, env_with_alias, ctes)
        return out_cols

    def _resolve_from(self, f: dict | None, ctes: dict, outer: list) -> dict:
        if not f or f.get("type") == "EMPTY":
            return self._mk_env([])
        ftype = f.get("type")
        alias = f.get("alias")
        if ftype == "BASE_TABLE":
            name = f.get("table_name")
            cols = ctes.get(name)
            if cols is None:
                cols = self.base.get(name)
            if cols is None:
                self.unresolved.append(f"table:{name}")
                cols = []
            cols = self._apply_col_alias(cols, f)
            return self._mk_env(cols, alias or name)
        if ftype == "SUBQUERY":
            cols = self.infer_statement(f["subquery"]["node"], ctes, outer)
            cols = self._apply_col_alias(cols, f)
            return self._mk_env(cols, alias)
        if ftype == "JOIN":
            left = self._resolve_from(f.get("left"), ctes, outer)
            # comma-joins and LATERAL expose the left side's columns to the
            # right side (unnest(range(len(t))) style correlation)
            right = self._resolve_from(f.get("right"), ctes, [left] + outer)
            left_names = {n for n, _ in left["cols"]}
            merged_cols = left["cols"] + [
                c for c in right["cols"] if c[0] not in left_names
            ]
            env = {"map": {**right["map"], **left["map"]}, "cols": merged_cols}
            if f.get("condition"):
                self.type_expr(f["condition"], [env] + outer, ctes)
            return env
        if ftype == "TABLE_FUNCTION":
            fn = f.get("function", {})
            fname = (fn.get("function_name") or "").lower()
            for ch in fn.get("children", []):
                self.type_expr(ch, [self._mk_env([])] + outer, ctes)
            if fname in ("range", "generate_series"):
                cols = [(fname, "int64")]
            elif fname == "generate_subscripts":
                cols = [("generate_subscripts", "int64")]
            elif fname == "unnest":
                t = self.type_expr(fn["children"][0], [self._mk_env([])] + outer, ctes)
                elem = t[1] if isinstance(t, tuple) and t[0] == "list" else "unknown"
                cols = [("unnest", elem)]
            else:
                self.unresolved.append(f"table-function:{fname}")
                cols = []
            cols = self._apply_col_alias(cols, f)
            return self._mk_env(cols, alias)
        if ftype == "EXPRESSION_LIST":
            rows = f.get("values") or []
            cols = []
            if rows:
                width = len(rows[0])
                base_env = [self._mk_env([])] + outer
                for i in range(width):
                    t: Any = "null"
                    for r in rows:
                        t = self._promote(t, self.type_expr(r[i], base_env, ctes))
                    cols.append((f"col{i}", t))
            cols = self._apply_col_alias(cols, f)
            return self._mk_env(cols, alias)
        self.unresolved.append(f"from:{ftype}")
        return self._mk_env([])

    @staticmethod
    def _apply_col_alias(cols: list, f: dict) -> list:
        names = f.get("column_name_alias") or []
        if not names:
            return cols
        return [
            (names[i] if i < len(names) else c[0], c[1]) for i, c in enumerate(cols)
        ]

    # --------------------------- expressions ------------------------------

    def _promote(self, a: Any, b: Any) -> Any:
        if a == "null" or a is None:
            return b
        if b == "null" or b is None:
            return a
        if a == b:
            return a
        if a == "unknown" or b == "unknown":
            return "unknown"
        order = [
            "bool", "int8", "int16", "int32", "uint32", "int64", "uint64",
            "hugeint", "decimal", "double",
        ]
        if isinstance(a, str) and isinstance(b, str) and a in order and b in order:
            return order[max(order.index(a), order.index(b))]
        return a if isinstance(a, tuple) else b if isinstance(b, tuple) else a

    def type_expr(self, e: dict, envs: list, ctes: dict) -> Any:
        cls = e.get("class")
        if cls == "CONSTANT":
            tid = e.get("value", {}).get("type", {}).get("id", "UNKNOWN")
            if tid == "LIST":
                return ("list", "unknown")
            return _DUCK_TO_LATTICE.get(tid, "decimal" if tid == "DECIMAL" else "unknown")
        if cls == "COLUMN_REF":
            names = e.get("column_names", [])
            t = self._env_lookup(envs, names)
            if t is None:
                self.unresolved.append(f"column:{'.'.join(names)}")
                return "unknown"
            return t
        if cls == "CAST":
            self.type_expr(e["child"], envs, ctes)
            return self._cast_type(e.get("cast_type", {}))
        if cls in ("COMPARISON", "CONJUNCTION", "BETWEEN"):
            for k in ("left", "right", "input", "lower", "upper"):
                if e.get(k):
                    self.type_expr(e[k], envs, ctes)
            for c in e.get("children", []):
                self.type_expr(c, envs, ctes)
            return "bool"
        if cls == "OPERATOR":
            return self._type_operator(e, envs, ctes)
        if cls == "CASE":
            t: Any = "null"
            for chk in e.get("case_checks", []):
                self.type_expr(chk["when_expr"], envs, ctes)
                t = self._promote(t, self.type_expr(chk["then_expr"], envs, ctes))
            if e.get("else_expr"):
                t = self._promote(t, self.type_expr(e["else_expr"], envs, ctes))
            return t
        if cls == "FUNCTION":
            return self._type_function(e, envs, ctes)
        if cls == "WINDOW":
            return self._type_window(e, envs, ctes)
        if cls == "SUBQUERY":
            sub_t = e.get("subquery_type")
            if e.get("child"):
                self.type_expr(e["child"], envs, ctes)
            cols = self.infer_statement(e["subquery"]["node"], ctes, envs)
            if sub_t == "SCALAR":
                return cols[0][1] if cols else "unknown"
            return "bool"
        if cls == "LAMBDA":
            # typed by the enclosing function; standalone -> unknown
            return "unknown"
        if cls == "STAR":
            return "unknown"
        self.unresolved.append(f"expr-class:{cls}")
        return "unknown"

    def _cast_type(self, ct: dict) -> Any:
        tid = ct.get("id", "UNKNOWN")
        if tid == "LIST":
            child = ct.get("type_info", {}).get("child_type", {})
            return ("list", self._cast_type(child))
        if tid == "STRUCT":
            infos = ct.get("type_info", {}).get("child_types", []) or []
            return ("struct", tuple(
                (c.get("first", "?"), self._cast_type(c.get("second", {})))
                for c in infos
            ))
        if tid == "DECIMAL":
            return "decimal"
        return _DUCK_TO_LATTICE.get(tid, "unknown")

    def _type_operator(self, e: dict, envs: list, ctes: dict) -> Any:
        otype = e.get("type", "")
        kids = e.get("children", [])
        kid_types = [self.type_expr(c, envs, ctes) for c in kids]
        if otype in ("OPERATOR_IS_NULL", "OPERATOR_IS_NOT_NULL", "OPERATOR_NOT"):
            return "bool"
        if otype in ("COMPARE_IN", "COMPARE_NOT_IN"):
            return "bool"
        if otype == "OPERATOR_COALESCE":
            t: Any = "null"
            for kt in kid_types:
                t = self._promote(t, kt)
            return t
        if otype == "ARRAY_EXTRACT":
            base = kid_types[0]
            if isinstance(base, tuple) and base[0] == "list":
                return base[1]
            if isinstance(base, tuple) and base[0] == "struct":
                fields = base[1]
                idx = self._const_value(kids[1]) if len(kids) > 1 else None
                if isinstance(idx, int) and 1 <= idx <= len(fields):
                    return fields[idx - 1][1]
                for fname, ftype in fields:
                    if fname == idx:
                        return ftype
                return "unknown"
            if base == "varchar":
                return "varchar"
            return "unknown"
        if otype == "ARRAY_SLICE":
            return kid_types[0]
        if otype == "ARRAY_CONSTRUCTOR":
            t: Any = "null"
            for kt in kid_types:
                t = self._promote(t, kt)
            return ("list", t)
        self.unresolved.append(f"operator:{otype}")
        return "unknown"

    def _type_function(self, e: dict, envs: list, ctes: dict) -> Any:
        fname = (e.get("function_name") or "").lower()
        kids = e.get("children", [])
        if e.get("filter"):
            self.type_expr(e["filter"], envs, ctes)

        # lambda-taking list functions: bind param to element type
        if kids and any(k.get("class") == "LAMBDA" for k in kids):
            return self._type_lambda_fn(fname, kids, envs, ctes)

        kid_types = [self.type_expr(c, envs, ctes) for c in kids]
        kid_lits = [self._lit_for_probe(c, t) for c, t in zip(kids, kid_types)]

        # ANSI `percentile_disc(f) WITHIN GROUP (ORDER BY x)` serializes as
        # quantile_disc with the fraction as the only child and the target
        # expression inside the node's order_bys modifier.
        wg_orders = (e.get("order_bys") or {}).get("orders") or []
        if fname in ("quantile_disc", "quantile_cont") and wg_orders:
            target_t = self.type_expr(wg_orders[0]["expression"], envs, ctes)
            frac = kid_lits[0] if kid_lits else 0.5
            return self._fn_type(fname, [target_t, "double"],
                                 [None, frac if frac is not None else 0.5])

        if fname in ("count_star", "count"):
            return "int64"
        if fname == "generate_subscripts":
            return "int64"
        if fname == "unnest":
            base = kid_types[0] if kid_types else "unknown"
            return base[1] if isinstance(base, tuple) and base[0] == "list" else "unknown"
        if fname in ("list", "list_value", "array_agg"):
            t: Any = "null"
            for kt in kid_types:
                t = self._promote(t, kt)
            return ("list", t)
        if fname == "struct_pack":
            return (
                "struct",
                tuple((k.get("alias", f"f{i}"), kid_types[i]) for i, k in enumerate(kids)),
            )
        if fname == "list_zip":
            fields = []
            for i, kt in enumerate(kid_types):
                elem = kt[1] if isinstance(kt, tuple) and kt[0] == "list" else "unknown"
                fields.append((f"list_{i+1}", elem))
            return ("list", ("struct", tuple(fields)))
        if fname == "list_aggregate" and len(kids) >= 2 and isinstance(kid_lits[1], str):
            base = kid_types[0]
            elem = base[1] if isinstance(base, tuple) and base[0] == "list" else "unknown"
            return self._fn_type(kid_lits[1].lower(), [elem])
        if fname in ("min", "max", "any_value", "first", "last", "arbitrary",
                     "min_by", "max_by", "lag", "lead", "mode"):
            return kid_types[0] if kid_types else "unknown"
        if fname == "row":
            return ("struct", tuple((f"f{i}", t) for i, t in enumerate(kid_types)))

        # integral multiply / shift flagging happens on '*' and '<<'
        if fname == "*" and len(kids) == 2:
            t = self._fn_type("*", kid_types)
            self._maybe_flag_mul(e, kids, t)
            return t
        if fname == "<<" and len(kids) == 2:
            self.flags.append(Flag("shiftleft", self._render(e)))
            return self._fn_type("<<", kid_types)

        t = self._fn_type(fname, kid_types, kid_lits)
        if t == "unknown":
            self.unresolved.append(
                f"fn:{fname}({', '.join(str(k) for k in kid_types)})"
            )
        return t

    def _type_lambda_fn(self, fname: str, kids: list, envs: list, ctes: dict) -> Any:
        list_t = self.type_expr(kids[0], envs, ctes)
        elem = list_t[1] if isinstance(list_t, tuple) and list_t[0] == "list" else "unknown"
        lam = next(k for k in kids if k.get("class") == "LAMBDA")
        lhs = lam.get("lhs", {})
        params = []
        if lhs.get("class") == "COLUMN_REF":
            params = [lhs["column_names"][-1]]
        elif lhs.get("class") == "FUNCTION":  # (a, b) -> row fn
            params = [c["column_names"][-1] for c in lhs.get("children", [])
                      if c.get("class") == "COLUMN_REF"]
        pmap = {}
        if params:
            pmap[params[0]] = elem
            for extra in params[1:]:
                pmap[extra] = "int64"  # (elem, index) form
        body_env = [{"map": pmap, "cols": []}] + envs
        body_t = self.type_expr(lam["expr"], body_env, ctes)
        if fname in ("list_transform", "array_transform", "apply"):
            return ("list", body_t)
        if fname in ("list_filter", "array_filter"):
            return list_t
        if fname in ("list_reduce", "array_reduce"):
            return body_t
        self.unresolved.append(f"lambda-fn:{fname}")
        return "unknown"

    def _maybe_flag_mul(self, e: dict, kids: list, result: Any):
        v0 = self._const_value(kids[0])
        v1 = self._const_value(kids[1])
        v0 = v0 if isinstance(v0, (int, float)) else None
        v1 = v1 if isinstance(v1, (int, float)) else None
        if v0 is not None and v1 is not None:
            return  # constant folds
        if result == "unknown":
            self.flags.append(Flag("unknown-type", self._render(e)))
            return
        if not (isinstance(result, str) and result in _INTEGRAL):
            return
        if v0 is not None or v1 is not None:
            v = v0 if v0 is not None else v1
            if abs(v) >= LIT_BOUND:
                self.flags.append(Flag("big-literal", self._render(e)))
            return
        self.flags.append(Flag("col-x-col", self._render(e)))

    def _type_window(self, e: dict, envs: list, ctes: dict) -> Any:
        for p in e.get("partitions", []) or []:
            self.type_expr(p, envs, ctes)
        for o in e.get("orders", []) or []:
            if "expression" in o:
                self.type_expr(o["expression"], envs, ctes)
        for key in ("offset_expr", "default_expr", "start_expr", "end_expr",
                    "filter_expr"):
            if e.get(key):
                self.type_expr(e[key], envs, ctes)
        kid_types = [self.type_expr(c, envs, ctes) for c in e.get("children", [])]
        kid_lits = [
            self._lit_for_probe(c, t)
            for c, t in zip(e.get("children", []), kid_types)
        ]
        wtype = e.get("type", "")
        if wtype in _WINDOW_FIXED:
            return _WINDOW_FIXED[wtype]
        if wtype in _WINDOW_PASSTHROUGH:
            return kid_types[0] if kid_types else "unknown"
        fname = (e.get("function_name") or "").lower()
        if fname in ("count", "count_star"):
            return "int64"
        if fname in ("min", "max", "any_value", "first", "last", "first_value",
                     "last_value", "nth_value", "lag", "lead", "mode"):
            return kid_types[0] if kid_types else "unknown"
        t = self._fn_type(fname, kid_types, kid_lits)
        if t == "unknown":
            self.unresolved.append(f"window-fn:{fname}")
        return t


# ---------------------------------------------------------------------------

_PROBE_CON = None


def _get_probe_con() -> duckdb.DuckDBPyConnection:
    global _PROBE_CON
    if _PROBE_CON is None:
        _PROBE_CON = duckdb.connect()
    return _PROBE_CON


def _render_lit(lit: Any) -> str | None:
    """SQL literal text for a constant probe argument, or None."""
    if isinstance(lit, bool):
        return "TRUE" if lit else "FALSE"
    if isinstance(lit, int) and abs(lit) < 10**15:
        return str(lit)
    if isinstance(lit, float) and abs(lit) < 10**15:
        return repr(lit)
    if isinstance(lit, str) and len(lit) < 80:
        return "'" + lit.replace("'", "''") + "'"
    return None


@functools.lru_cache(maxsize=8192)
def _fn_type_cached(fn: str, rendered_args: tuple) -> Any:
    """Result type of fn(args) per DuckDB's own binder.

    rendered_args: tuple of (sql_type_text|None, const_value|None). A
    constant arg is probed as its literal (needed for quantile fractions,
    list_aggregate names, date_part specifiers); otherwise CAST(NULL AS T).
    """
    parts = []      # expression text per arg (literal or column ref)
    row_vals = []   # VALUES row entries for non-literal args
    row_cols = []
    for i, (sql_t, lit) in enumerate(rendered_args):
        lit_txt = _render_lit(lit)
        if lit_txt is not None:
            parts.append(lit_txt)
        elif sql_t is not None:
            # NULL constants get constant-folded before typeof() sees the
            # expression, so route every typed NULL through a one-row VALUES
            # scan — the binder then reports the true expression type.
            col = f"a{i}"
            parts.append(col)
            row_vals.append(f"CAST(NULL AS {sql_t})")
            row_cols.append(col)
        else:
            return "unknown"
    con = _get_probe_con()
    if fn in ("*", "+", "-", "/", "//", "%", "<<", ">>", "&", "|", "^", "||",
              "~~", "!~~"):
        if len(parts) == 1:
            expr = f"{fn}({parts[0]})"
        else:
            expr = f"({parts[0]} {fn} {parts[1]})"
    else:
        expr = f"{fn}({', '.join(parts)})"
    if row_vals:
        probe_sql = (
            f"SELECT typeof({expr}) FROM (VALUES ({', '.join(row_vals)})) "
            f"t({', '.join(row_cols)})"
        )
    else:
        probe_sql = f"SELECT typeof({expr})"
    typer = OracleTyper(con, {})
    try:
        name = con.execute(probe_sql).fetchone()[0]
    except Exception:
        return "unknown"
    return typer._parse_duck_typename(name)


def _load_base_schemas(sf_dir: str) -> dict:
    con = _get_probe_con()
    typer = OracleTyper(con, {})
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for t in tables:
        rows = con.execute(
            f"DESCRIBE SELECT * FROM '{sf_dir}/{t}.parquet'"
        ).fetchall()
        out[t] = [(r[0], typer._parse_duck_typename(r[1])) for r in rows]
    return out


def scan_oracle(sql: str, base_schemas: dict) -> tuple[list[Flag], list[str]]:
    """Flags + unresolved-inference notes for one oracle SQL text."""
    con = _get_probe_con()
    esc = sql.replace("'", "''")
    ast = json.loads(
        con.execute(f"SELECT json_serialize_sql('{esc}')").fetchone()[0]
    )
    if ast.get("error"):
        return [Flag("parse-error", str(ast.get("error_message"))[:120])], []
    typer = OracleTyper(con, base_schemas)
    for st in ast.get("statements", []):
        typer.infer_statement(st["node"], {}, [])
    return typer.flags, typer.unresolved
