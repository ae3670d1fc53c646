"""Regenerate docs/OPERATORS.md from the query registry.

Usage: python scripts/gen_operator_index.py
The index is committed so readers don't need a Spark session to browse
the surface; re-run after adding operators (test_operator_index pins
that the committed file names every registered op).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_export_system_spark.registry import load_all  # noqa: E402

HEADER = """# Operator index

Auto-generated from `cdc_export_system_spark/registry.py` by
`scripts/gen_operator_index.py` — do not edit by hand.

Every row is a key in `__spark_entry__.py:queries()`. **oracle** means the
op carries DuckDB oracle SQL and hash-matches at sf0.01 (and the sf0.1
sweep); *rows-only* ops are sketches / nondeterministic functions /
iterative float fixpoints, each pinned by a dedicated accuracy or
replica test instead. **headline** ops are timed by `bench.py` each round.
"""


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    line = " ".join(doc.strip().split("\n\n")[0].split())
    return line if len(line) <= 160 else line[:157] + "..."


def main() -> None:
    registry = load_all()
    by_tag: dict[str, list[str]] = defaultdict(list)
    for name, spec in registry.items():
        by_tag[spec.tags[0] if spec.tags else "misc"].append(name)

    out = [HEADER]
    out.append(f"**{len(registry)} operators** | "
               f"{sum(1 for s in registry.values() if s.oracle)} oracle-checked | "
               f"{sum(1 for s in registry.values() if not s.oracle)} rows-only | "
               f"{sum(1 for s in registry.values() if s.headline)} headline\n")
    for tag in sorted(by_tag):
        out.append(f"\n## {tag} ({len(by_tag[tag])})\n")
        out.append("| op | check | summary |")
        out.append("|---|---|---|")
        for name in sorted(by_tag[tag]):
            spec = registry[name]
            check = "oracle" if spec.oracle else "rows-only"
            if spec.headline:
                check += " · headline"
            out.append(f"| `{name}` | {check} | {first_line(spec.fn.__doc__)} |")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "OPERATORS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(registry)} ops")


if __name__ == "__main__":
    main()
