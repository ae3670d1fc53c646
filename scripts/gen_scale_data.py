"""Generate a 10x (sf1-equivalent) dataset for scaling-ratio measurement.

VERDICT r06 item 5: the SCALING.md contracts are argued from plan shape;
this script manufactures a measured data point — run the headliners at
sf0.1 and at this 10x set, record the wall-time ratio per query, and
investigate anything superlinear.

/root/testdata is read-only, so output lands in ``testdata_sf1/`` under
the repo root (gitignored). Construction, per table:

* ``region``/``nation`` — copied (fixed dimensions, as in TPC-H).
* ``customer``/``supplier``/``part``/``orders``/``lineitem``/``events``
  — 10 key-shifted copies: every key/FK column shifts by
  ``copy * stride`` with stride = max(key)+1 from sf0.1, so per-key
  group sizes stay constant while global cardinality grows 10x (the
  scaling shape a real 10x corpus has). Value and timestamp columns are
  untouched: 10x rows over the same 30-day window models 10x traffic.
* ``documents`` — REGENERATED, not copied: 10 identical copies of a
  text corpus would be a degenerate dedup input (every doc 9x
  near-duplicated; winnowing/substring pair counts would explode
  quadratically in the copy count and misread as superlinear scaling).
  New docs sample the sf0.1 empirical unigram/lang/source/length
  distributions via hash-based draws — fully distributed, seeded,
  deterministic.
* ``embeddings`` — 10 vec_id-shifted copies with a deterministic
  per-copy perturbation (hash noise, +-5% per component) so ANN
  neighbor structure is preserved without exact-duplicate vectors.

Everything is Spark-native (spark.range + column expressions — no
driver-side loops), so the same script generates 100x or 1000x by
changing COPIES/DOC_FACTOR.

Usage: python scripts/gen_scale_data.py [out_dir] [copies] [tables]
``tables`` is an optional comma-separated subset (e.g. ``documents``)
to regenerate in place without rewriting the rest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
SEED = 20260815


def _copies_df(spark, n):
    return spark.range(n).select(F.col("id").cast("bigint").alias("copy"))


def replicate_shifted(
    df: DataFrame, spark, n_copies: int, shift_cols: dict[str, int]
) -> DataFrame:
    """n key-shifted copies: col += copy * stride for each (col, stride)."""
    out = df.crossJoin(F.broadcast(_copies_df(spark, n_copies)))
    for col, stride in shift_cols.items():
        out = out.withColumn(
            col, (F.col(col) + F.col("copy") * F.lit(stride)).cast("bigint")
        )
    return out.drop("copy")


def stride_of(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).head()[0]) + 1


def gen_documents(spark, n_docs: int) -> DataFrame:
    """Sample new docs from the sf0.1 empirical distributions with
    hash-based draws (xxhash64 is a pure function of its args — the
    output is deterministic for a given seed and independent of
    partitioning).

    Vocabulary (VERDICT r07 item 3): the source corpus has only ~31
    word types, which concentrates shingle document-frequency and
    SimHash fingerprints far beyond any real corpus — the 10x sweep's
    worst text/dedup ratios measured that degeneracy, not the
    operators. New draws are ZIPFIAN over a Heaps-law-sized vocabulary:
    V = max(1000, 20 * total_words^0.45) types; rank drawn by the
    closed-form inverse CDF rank = ceil(exp(u * ln(V))) (density ~ 1/k,
    i.e. Zipf s=1) — a pure column expression, no giant literal array,
    no driver-side sampling. The source's real word types keep the top
    ranks so stopword-sensitive text ops still see them; deeper ranks
    are synthetic types ("w<rank>")."""
    src_docs = load_table(spark, SRC, "documents")
    vocab = [
        r["w"]
        for r in src_docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .collect()
    ]
    langs = [
        (r["lang"], r["count"])
        for r in src_docs.groupBy("lang").count().orderBy("lang").collect()
    ]
    sources = [r["source"] for r in src_docs.select("source").distinct().collect()]
    sources.sort()
    len_min, len_max = (
        src_docs.select(
            F.min(F.size(F.split(F.trim("text"), r"\s+"))).alias("lo"),
            F.max(F.size(F.split(F.trim("text"), r"\s+"))).alias("hi"),
        ).head()
    )

    # lang: cumulative-weight pick on a hash-uniform draw
    total = sum(c for _, c in langs)
    cum, acc = [], 0
    for lang, c in langs:
        acc += c
        cum.append((lang, acc / total))
    lang_expr = None
    u = (F.pmod(F.xxhash64(F.lit("lang"), "doc_id", F.lit(SEED)), 1_000_000)
         / 1_000_000.0)
    for lang, bound in reversed(cum):
        lang_expr = (
            F.lit(lang) if lang_expr is None
            else F.when(u < F.lit(bound), F.lit(lang)).otherwise(lang_expr)
        )

    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    src_arr = F.array(*[F.lit(s) for s in sources])
    n_words = (
        F.lit(len_min)
        + F.pmod(
            F.xxhash64(F.lit("len"), "doc_id", F.lit(SEED)),
            F.lit(len_max - len_min + 1),
        )
    ).cast("int")
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))

    # Heaps-law vocabulary size for the target corpus volume
    total_words = n_docs * (len_min + len_max) / 2.0
    v_size = max(1000, int(20 * total_words**0.45))

    def word_at(i):
        # u in (0, 1]: hash-uniform; rank = ceil(exp(u * ln(V))) gives
        # P(rank = k) ~ 1/k over [1, V] (Zipf s=1) in closed form
        u = (
            F.pmod(
                F.xxhash64(F.lit("w"), F.col("doc_id"), i, F.lit(SEED)),
                F.lit(1_000_000),
            )
            + 1
        ) / 1_000_000.0
        rank = F.least(
            F.lit(v_size),
            F.greatest(
                F.lit(1),
                F.ceil(F.exp(u * F.log(F.lit(float(v_size))))).cast("int"),
            ),
        )
        return F.when(
            rank <= F.lit(len(vocab)), F.element_at(vocab_arr, rank)
        ).otherwise(F.concat(F.lit("w"), rank.cast("string")))

    text = F.array_join(
        F.transform(F.sequence(F.lit(1), n_words), word_at),
        " ",
    )
    return docs.select(
        "doc_id",
        text.alias("text"),
        lang_expr.alias("lang"),
        F.element_at(
            src_arr,
            (
                F.pmod(
                    F.xxhash64(F.lit("s"), "doc_id", F.lit(SEED)),
                    F.lit(len(sources)),
                )
                + 1
            ).cast("int"),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))


def gen_embeddings(spark, n_copies: int) -> DataFrame:
    emb = load_table(spark, SRC, "embeddings")
    stride = stride_of(emb, "vec_id")
    out = emb.crossJoin(F.broadcast(_copies_df(spark, n_copies)))
    perturbed = F.transform(
        "embedding",
        lambda x, j: F.when(F.col("copy") == 0, x).otherwise(
            x
            * (
                1.0
                + (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), F.col("copy"), j, F.lit(SEED)),
                        F.lit(1000),
                    )
                    - 500
                )
                / 10000.0
            )
        ).cast("float"),
    )
    return out.select(
        (F.col("vec_id") + F.col("copy") * stride).cast("bigint").alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="gen-scale-data")
    os.makedirs(out_dir, exist_ok=True)

    def wanted(name: str) -> bool:
        return only is None or name in only

    def write(df: DataFrame, name: str) -> None:
        df.coalesce(max(1, n_copies // 2)).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"_{name}")
        )
        # single-file layout like the source dir (readers glob *.parquet)
        import glob as _g
        import shutil

        part = sorted(_g.glob(os.path.join(out_dir, f"_{name}", "*.parquet")))
        if len(part) == 1:
            shutil.move(part[0], os.path.join(out_dir, f"{name}.parquet"))
            shutil.rmtree(os.path.join(out_dir, f"_{name}"))
        else:  # multi-file: keep as a directory named <name>.parquet
            dst = os.path.join(out_dir, f"{name}.parquet")
            shutil.rmtree(dst, ignore_errors=True)
            shutil.move(os.path.join(out_dir, f"_{name}"), dst)
        print(f"wrote {name}")

    for name in ("region", "nation"):
        if wanted(name):
            write(load_table(spark, SRC, name), name)

    if wanted("customer"):
        cust = load_table(spark, SRC, "customer")
        write(
            replicate_shifted(
                cust, spark, n_copies, {"c_custkey": stride_of(cust, "c_custkey")}
            ),
            "customer",
        )
    if wanted("supplier"):
        supp = load_table(spark, SRC, "supplier")
        write(
            replicate_shifted(
                supp, spark, n_copies, {"s_suppkey": stride_of(supp, "s_suppkey")}
            ),
            "supplier",
        )
    if wanted("part"):
        part = load_table(spark, SRC, "part")
        write(
            replicate_shifted(
                part, spark, n_copies, {"p_partkey": stride_of(part, "p_partkey")}
            ),
            "part",
        )
    if wanted("orders"):
        orders = load_table(spark, SRC, "orders")
        cust = load_table(spark, SRC, "customer")
        write(
            replicate_shifted(
                orders,
                spark,
                n_copies,
                {
                    "o_orderkey": stride_of(orders, "o_orderkey"),
                    "o_custkey": stride_of(cust, "c_custkey"),
                },
            ),
            "orders",
        )
    if wanted("lineitem"):
        li = load_table(spark, SRC, "lineitem")
        orders = load_table(spark, SRC, "orders")
        supp = load_table(spark, SRC, "supplier")
        part = load_table(spark, SRC, "part")
        write(
            replicate_shifted(
                li,
                spark,
                n_copies,
                {
                    "l_orderkey": stride_of(orders, "o_orderkey"),
                    "l_partkey": stride_of(part, "p_partkey"),
                    "l_suppkey": stride_of(supp, "s_suppkey"),
                },
            ),
            "lineitem",
        )
    if wanted("events"):
        ev = load_table(spark, SRC, "events")
        write(
            replicate_shifted(
                ev,
                spark,
                n_copies,
                {
                    "event_id": stride_of(ev, "event_id"),
                    "user_id": stride_of(ev, "user_id"),
                },
            ),
            "events",
        )

    if wanted("documents"):
        n_docs = load_table(spark, SRC, "documents").count() * n_copies
        write(gen_documents(spark, n_docs), "documents")
    if wanted("embeddings"):
        write(gen_embeddings(spark, n_copies), "embeddings")
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
