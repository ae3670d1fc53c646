"""Benchmark harness: times the engine's headline queries.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Prints exactly one JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Each query executes to completion via the noop sink (full plan runs,
nothing is collected to the driver). One full unmeasured warm-up pass
(JMH-style) absorbs JVM start-up, codegen/JIT, and parquet footer reads;
each query is then measured five times (build + execute, end to end)
and the fastest pass is reported — min-of-N is the standard estimator
for the noise-free steady state on a shared host. Round-2 lesson
(docs/BENCH_NOTES.md): min-of-3 under-samples on this host — three
queries appeared 1.46-1.48x slower with byte-identical plans, and a
10-rep isolated rerun put two of them back at/below their round-1
times. Five reps plus the published per-query median/max spread make
noise visible instead of shipping it as a phantom regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # Quiet-host gate (round-10 verdict #3): two rounds running, the
    # official window shipped from a loaded host (r9 ~25% inflation; r10
    # load1 3.3 in its own contract line). Ambient load1 > 1.0 now
    # BLOCKS the bench — poll until the host quiets, up to
    # SPARK_GRAFT_BENCH_MAX_WAIT_S (default 900 s). On timeout the bench
    # still emits its one contract line (a missing BENCH_rN.json is
    # worse than an annotated noisy one) with load_gate:"timeout" so a
    # turbulent window can never masquerade as a clean number of record.
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "900"))
    load_gate = "quiet"
    deadline = time.monotonic() + max_wait
    while True:
        try:
            load1 = round(os.getloadavg()[0], 2)  # ambient, BEFORE ours
        except OSError:
            load1 = -1.0
            break
        if load1 <= 1.0:
            break
        if time.monotonic() >= deadline:
            load_gate = "timeout"
            print(
                f"bench: host still loaded (load1={load1}) after "
                f"{max_wait:.0f}s wait; recording a TURBULENT window",
                file=sys.stderr,
            )
            break
        print(
            f"bench: host loaded (load1={load1} > 1.0); waiting for a "
            "quiet window...",
            file=sys.stderr,
        )
        time.sleep(15.0)

    spark = get_spark(app_name="cdc-export-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline}
    # Opt-in subset filter for scaling runs (r11 verdict #2): the
    # 25x c8-vs-c32 sweeps time a handful of data-heavy headliners so
    # low/high core counts separate. UNSET in every driver run — the
    # default query set, methodology, and contract line are unchanged.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        names = {n.strip() for n in subset.split(",") if n.strip()}
        unknown = names - set(headline)
        if unknown:
            raise SystemExit(f"unknown headline queries: {sorted(unknown)}")
        headline = {n: s for n, s in headline.items() if n in names}

    # warm-up pass: JVM, parquet footer reads, codegen/JIT — unmeasured
    for name in sorted(headline):
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    maxima: dict[str, float] = {}
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    for name in sorted(headline):
        spec = registry[name]
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        samples.sort()
        timings[name] = round(samples[0], 4)
        medians[name] = round(samples[len(samples) // 2], 4)
        maxima[name] = round(samples[-1], 4)

    total = round(sum(timings.values()), 4)
    # Contract line: MINIMAL and FIRST. Round 6's line carried
    # min+median+max for 26 queries plus a preamble and outgrew the
    # driver's tail capture (BENCH_r06.json came back parsed:null), so
    # the machine-readable record was lost. The driver needs exactly
    # total + per-query min; the full median/max spread stays in the
    # local side file. Two SCALAR honesty fields ride along (round-9
    # lesson: the official window shipped ~25% ambient inflation with
    # byte-identical plans, and nothing in the line said so):
    #   noise = sum(per-query median) / sum(per-query min) — ~1.0 on a
    #     quiet host; >>1 means the window itself was turbulent;
    #   load1 = 1-min load average when the bench started (a busy host
    #     self-identifies even if the reps happen to agree).
    noise = round(sum(medians.values()) / total, 3) if total else 1.0
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "noise": noise,
                "load1": load1,
                "load_gate": load_gate,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail_local.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "value": total,
                    "queries": timings,
                    "queries_median": medians,
                    "queries_max": maxima,
                    "reps": reps,
                    "sf": sf,
                },
                f,
                indent=1,
            )
    except OSError:
        pass  # detail file is best-effort; the contract line already shipped


if __name__ == "__main__":
    main()
