"""One 25x-class probe for the quadratic family (VERDICT r08 item 7).

`sim_pairwise_by_label` is quadratic BY DEFINITION (all embedding pairs
within each label); SCALING.md argues its triangle scheduler keeps the
quadratic growth on balanced tasks, with measured points at 1x and 10x.
This script manufactures the 25x point: embeddings at 25 key-shifted,
hash-perturbed copies (same construction as testdata_sf1), one timed
run, and the measured pair count — turning "pairs grow as n^2" into a
ratio with an anchor far beyond the 10x sweep.

Usage: python scripts/probe_25x.py [out_dir]
Writes the dataset to <repo>/testdata_25x (embeddings only; the probe
ops read nothing else) and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "testdata_25x"
    )
    spark = get_spark(app_name="probe-25x")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        sys.path.insert(0, os.path.join(repo, "scripts"))
        from gen_scale_data import gen_embeddings

        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, "_embeddings")
        gen_embeddings(spark, 25).coalesce(12).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        if len(part) == 1:
            os.replace(os.path.join(tmp, part[0]), emb_path)
        else:  # multi-file: keep the directory as the parquet "file"
            os.replace(tmp, emb_path)

    reg = load_all()
    fn = reg["sim_pairwise_by_label"].fn
    t0 = time.time()
    df = fn(spark, out_dir)
    # aggregate over cos_sim so Catalyst cannot column-prune the dot
    # products away (a bare count() times only the pair join)
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cos_sim").alias("s")
    ).head()
    n_pairs = int(row["n"])
    checksum = float(row["s"])
    wall = round(time.time() - t0, 2)
    n_vecs = spark.read.parquet(emb_path).count()
    print(json.dumps({
        "probe": "sim_pairwise_by_label@25x",
        "n_vecs": n_vecs,
        "n_pairs": n_pairs,
        "cos_sum": round(checksum, 3),
        "wall_s": wall,
    }))


if __name__ == "__main__":
    main()
