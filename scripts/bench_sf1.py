"""Per-round sf1 scale bench (VERDICT r07 item 5).

Times a fixed set of scale-sensitive queries at sf0.1 and at the 10x
dataset (testdata_sf1, built by scripts/gen_scale_data.py) and prints
one JSON line with per-query seconds + the 10x/1x ratio. The r7 sweep
was one-off; this makes scale regressions a per-round record
(BENCH_NOTES.md gets the table each round).

Usage: python scripts/bench_sf1.py [--reps 2] [--names a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark

# the scale-sensitive headliners the r7 verdict named, plus the five
# query-set-pinned eval ops (r7 item 4: must sit out of the >30 s class
# with ~linear ratios now that the query sample is fixed-size)
DEFAULT_NAMES = [
    # triangle-join family
    "dedup_embedding_cosine",
    "dedup_semantic_exact",
    "sim_pairwise_by_label",
    "dedup_simhash_banded_pairs",
    # winnowing / substring
    "text_winnowing_fingerprint",
    "dedup_winnowing_overlap",
    "dedup_exact_substring",
    # interval + quantiles
    "join_interval_bucketed",
    "agg_quantiles_distributed",
    # pinned eval ops
    "sim_knn_join",
    "ml_map_at_k",
    "ml_knn_classifier",
    "sim_hard_negatives",
    "sim_recall_at_k",
    # zipf-corpus text/dedup (the r7 sweep's df-cap worst cases)
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
)


def time_query(spark, fn, sf_dir: str, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--names", type=str, default=",".join(DEFAULT_NAMES))
    ap.add_argument("--skip-sf01", action="store_true")
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]

    spark = get_spark(app_name="bench-sf1")
    reg = load_all()
    out: dict[str, dict] = {}
    for name in names:
        if name not in reg:
            out[name] = {"err": "not registered"}
            continue
        row: dict = {}
        try:
            if not args.skip_sf01:
                row["sf0.1"] = time_query(spark, reg[name].fn, SF01, args.reps)
            row["sf1"] = time_query(spark, reg[name].fn, SF1, args.reps)
            if "sf0.1" in row and row["sf0.1"] > 0:
                row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            row["err"] = repr(e)[:200]
        out[name] = row
        print(f"# {name}: {row}", flush=True)
    print(json.dumps({"sf1_bench": out}, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
