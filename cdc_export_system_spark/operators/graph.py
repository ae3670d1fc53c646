"""Graph operators over the part co-purchase graph (engine extension).

The dedup family already runs one graph algorithm (connected components,
dedup/cluster.py); this module rounds out the graph surface with the two
other staples a relational engine is asked for — triangle counting and
degree ranking — over a graph DERIVED relationally: parts are nodes,
and an undirected edge links two parts that appear in the same order
(the co-purchase / co-occurrence graph, same shape as doc-pair graphs
in dedup clustering).

Scale notes (100 TB posture):

* Edge building is the dangerous step: an order with k parts emits
  C(k,2) pairs. Orders here are bounded (<=7 lineitems); at scale a
  hot-basket cap (drop orders with k > ~50, which carry no pairwise
  signal, exactly like MAX_SHINGLE_DF in dedup/jaccard.py) bounds the
  quadratic fan-out.
* Triangle counting uses the canonical a<b<c orientation, so every
  triangle is produced exactly once and the three-way self-join never
  revisits a permutation. The standard further refinement at scale —
  orienting edges from the lower-degree endpoint (so high-degree hubs
  never expand) — is a one-line change on the same plan shape.
* Both ops shuffle only the EDGE LIST (|E| rows of two longs), never
  lineitem payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import REGISTRY, register

MIN_SUPPORT = 2  # an edge needs >=2 co-purchases: one co-occurrence is noise

_DUCK_EDGES = f"""
        op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (SELECT a.p AS pa, b.p AS pb
              FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
              GROUP BY a.p, b.p HAVING count(*) >= {MIN_SUPPORT})
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges (canonical pa < pb) with co-occurrence
    support >= MIN_SUPPORT. The support threshold is what makes the graph
    family scale-stable: single co-occurrences in a large random basket
    stream are noise and grow O(|orders|), while repeated pairs are
    signal and grow with the real correlation structure — thresholding
    is the frequent-itemset standard, and it bounds the density the
    triangle join ever sees (without it, the sf0.1 wedge fan-out is
    ~10^8 on THIS data; with it, |E| is ~3.5k at every sf)."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE orderkey shuffle: baskets collapse to their (bounded, <=7 here;
    # hot-basket-capped at scale per the module docstring) distinct part
    # set and pairs expand row-locally inside each basket — replacing the
    # round-3 distinct + self-join form, which paid a distinct exchange
    # PLUS a join exchange of both sides for the same pair stream
    # (isolated 5-rep min at sf0.1: triangle 2.16 -> 1.57 s, degree_topk
    # 1.91 -> 1.49 s, common_neighbors 2.44 -> 2.04 s)
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(ps, (x, i) ->
                    transform(slice(ps, i + 2, size(ps) - i - 1),
                              y -> struct(x AS pa, y AS pb))))
                """
            )
        ).alias("e")
    )
    return (
        pairs.select("e.pa", "e.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
        .select("pa", "pb")
        # the |E|-row edge list is consumed 2-3x by every graph op
        # (wedge sides, closing edges, degree union); materialize it so
        # the basket pair generation runs ONCE per query, not once per
        # consuming branch (6 source scans at the round-3 audit of
        # graph_triangle_count)
        .localCheckpoint(eager=True)
    )


@register(
    "graph_triangle_count",
    oracle=f"""
        WITH {_DUCK_EDGES}
        SELECT count(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.pa = e1.pb
        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    """,
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count: the cohesion metric (clustering
    coefficient numerator). Canonical orientation a<b<c means each
    wedge (a-b, b-c) closes against exactly one edge (a, c); two hash
    joins on edge endpoints, shuffles carry |E| then |wedges| rows."""
    e = _edges(spark, sf_dir)
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    wedges = e1.join(e2, "b")
    return (
        wedges.join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


GRAPH_TOPK = 20


@register(
    "graph_degree_topk",
    oracle=f"""
        WITH {_DUCK_EDGES},
        deg AS (
            SELECT p, count(*) AS degree FROM (
                SELECT pa AS p FROM e UNION ALL SELECT pb AS p FROM e
            ) GROUP BY p)
        SELECT p AS partkey, degree FROM deg
        ORDER BY degree DESC, p LIMIT {GRAPH_TOPK}
    """,
    tags=("graph", "agg"),
)
def graph_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nodes by co-purchase degree (hub detection — the nodes a
    degree-oriented triangle count would never expand). Undirected
    degree = occurrences on either endpoint; TakeOrdered caps the
    result at k rows per partition before the single-partition merge."""
    e = _edges(spark, sf_dir)
    both = e.select(F.col("pa").alias("p")).unionAll(e.select(F.col("pb").alias("p")))
    return (
        both.groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.desc("degree"), F.asc("p"))
        .limit(GRAPH_TOPK)
        .select(F.col("p").alias("partkey"), "degree")
    )


PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85


@register(
    "graph_pagerank",
    oracle=None,  # iterative float fixpoint: NumPy-pinned in tests/test_pagerank.py
    tags=("graph", "ml"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the (symmetrized) co-purchase graph: PAGERANK_ITERS
    rounds of r <- (1-d)/N + d * sum(r_in/deg_in) — the canonical
    distributed power iteration. Per round: one |E|-row shuffle join of
    the edge list against the |V|-row rank table and one map-side-
    combined sum by destination; the edge list itself is computed once
    and reused. The symmetric graph has no dangling nodes (every node in
    the edge list has out-degree >= 1), so no dangling-mass correction
    term is needed. N is a driver scalar (O(1)); rank sums are floating
    accumulations, hence no SQL oracle — tests/test_pagerank.py pins the
    result against a NumPy power iteration within 1e-9."""
    e = _edges(spark, sf_dir)
    edges = (
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(e.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        # the loop-invariant dataset of an iterative algorithm gets
        # persisted (Spark's standard for power iteration): without this
        # the lazy edge derivation re-executes inside every round's plan
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    try:
        n = deg.count()  # |V|: driver scalar, broadcast into the expressions
        if n == 0:
            # empty graph: no nodes, no ranks (and no 1/N to compute)
            return deg.select(F.col("src").alias("node"), F.lit(0.0).alias("rank"))
        d = PAGERANK_DAMPING
        ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
        for _ in range(PAGERANK_ITERS):
            contribs = (
                edges.join(deg, "src")
                .join(ranks.withColumnRenamed("node", "src"), "src")
                .select(
                    F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
            )
            ranks = (
                contribs.groupBy("node")
                .agg(F.sum("c").alias("mass"))
                .select(
                    "node",
                    (F.lit((1 - d) / n) + F.lit(d) * F.col("mass")).alias("rank"),
                )
            )
        # Materialize the fixpoint (truncating the 5-round join lineage)
        # so edges/deg can be unpersisted before returning: repeated
        # invocations (bench rounds, test suite) would otherwise stack
        # cached partitions on the executors indefinitely.
        return ranks.localCheckpoint(eager=True)
    finally:
        deg.unpersist()
        edges.unpersist()


@register(
    "basket_association_rules",
    oracle=f"""
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM op),
        item AS (SELECT p, count(*) AS c FROM op GROUP BY p),
        pair AS (SELECT a.p AS pa, b.p AS pb, count(*) AS c_ab
                 FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
                 GROUP BY a.p, b.p HAVING count(*) >= {MIN_SUPPORT})
        SELECT pair.pa, pair.pb, pair.c_ab,
               ia.c AS c_a, ib.c AS c_b,
               round(CAST(pair.c_ab AS DOUBLE) / CAST(ia.c AS DOUBLE), 6)
                   AS confidence_a_to_b,
               round((CAST(pair.c_ab AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
                     / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE)), 6) AS lift
        FROM pair
        JOIN item ia ON pair.pa = ia.p
        JOIN item ib ON pair.pb = ib.p
        CROSS JOIN n
    """,
    tags=("graph", "agg", "ml"),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased part pairs:
    support count, confidence P(b|a) and lift P(a,b)/(P(a)P(b)) — the
    frequent-itemset readout behind 'customers who bought X also
    bought Y'. Same support-thresholded pair generation as the graph
    family (the quadratic fan-out is bounded per basket and thresholded
    pairs grow with real correlation, not noise); per-item counts are a
    |parts|-sized aggregate broadcast onto the pair list, and the basket
    total is a broadcast 1-row cross join. All ratios are single divides
    of exact integer counts composed identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct().localCheckpoint(eager=True)  # 16 B/row; 4 branches consume it
    n_baskets = op.agg(F.countDistinct("o").cast("bigint").alias("n_baskets"))
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = op.select("o", F.col("p").alias("pa"))
    b = op.select("o", F.col("p").alias("pb"))
    pair = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= MIN_SUPPORT)
    )
    ia = item.select(F.col("p").alias("pa"), F.col("c").alias("c_a"))
    ib = item.select(F.col("p").alias("pb"), F.col("c").alias("c_b"))
    return (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "pa",
            "pb",
            "c_ab",
            "c_a",
            "c_b",
            F.round(F.col("c_ab").cast("double") / F.col("c_a").cast("double"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                (F.col("c_ab").cast("double") * F.col("n_baskets").cast("double"))
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


BFS_MAX_HOPS = 4


@register(
    "graph_shortest_hops",
    oracle=f"""
        WITH RECURSIVE {_DUCK_EDGES},
        sym AS (SELECT pa AS src, pb AS dst FROM e
                UNION ALL SELECT pb AS src, pa AS dst FROM e),
        seed AS (SELECT min(pa) AS s FROM e),
        walk AS (
            -- s IS NOT NULL: a zero-edge graph yields min(pa) = NULL and
            -- the scalar-aggregate seed still produces one row, so filter
            -- it to match Spark's empty-DataFrame result on empty input
            SELECT s AS node, 0 AS hops FROM seed WHERE s IS NOT NULL
            UNION ALL
            SELECT sym.dst, walk.hops + 1
            FROM walk JOIN sym ON sym.src = walk.node
            WHERE walk.hops < {BFS_MAX_HOPS}
        )
        SELECT node AS partkey, CAST(min(hops) AS BIGINT) AS hops
        FROM walk GROUP BY node
    """,
    tags=("graph", "iterative", "recursive"),
)
def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted shortest-path hop count (BFS) from the smallest node
    of the co-purchase graph, bounded at BFS_MAX_HOPS — the reachability
    primitive behind 'related items within k steps'. Spark runs level-
    synchronous BFS: each round joins the current FRONTIER (only nodes
    first reached last round) against the edge list and anti-subtracts
    the visited set, so a node is expanded exactly once — the frontier
    shrinks as the search saturates, unlike the oracle's recursive CTE
    which re-walks every path (fine for DuckDB's in-memory check,
    quadratic poison at scale). Per round: one |frontier⋈E| shuffle;
    visited stays partitioned by node id.

    The recursive-CTE equivalence is exact because min(hops) over all
    paths == first-reach level in a level-synchronous BFS."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(e.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .persist()
    )
    try:
        seed_row = e.agg(F.min("pa").alias("s")).first()
        if seed_row is None or seed_row["s"] is None:
            return sym.select(
                F.col("src").alias("partkey"), F.lit(0).cast("bigint").alias("hops")
            ).filter(F.lit(False))
        seed = seed_row["s"]
        spark_ = e.sparkSession
        visited = spark_.createDataFrame([(seed, 0)], "partkey long, hops int")
        frontier = visited.select(F.col("partkey").alias("src"))
        for hop in range(1, BFS_MAX_HOPS + 1):
            reached = (
                frontier.join(sym, "src")
                .select(F.col("dst").alias("partkey"))
                .distinct()
                .join(visited.select("partkey"), "partkey", "left_anti")
                .withColumn("hops", F.lit(hop))
            )
            # materialize the level (truncates the iterative lineage the
            # same way graph_pagerank checkpoints its fixpoint)
            reached = reached.localCheckpoint(eager=True)
            if not reached.take(1):
                break
            visited = visited.unionAll(reached)
            frontier = reached.select(F.col("partkey").alias("src"))
        return visited.select("partkey", F.col("hops").cast("bigint").alias("hops"))
    finally:
        sym.unpersist()


@register(
    "graph_common_neighbors",
    oracle=f"""
        WITH {_DUCK_EDGES},
        sym AS (SELECT pa AS src, pb AS dst FROM e
                UNION ALL SELECT pb AS src, pa AS dst FROM e),
        adj AS (SELECT src, list_sort(list(DISTINCT dst)) AS ns
                FROM sym GROUP BY src)
        SELECT e.pa, e.pb,
               CAST(len(list_intersect(a.ns, b.ns)) AS BIGINT) AS n_common,
               CAST(len(a.ns) AS BIGINT) AS deg_a,
               CAST(len(b.ns) AS BIGINT) AS deg_b,
               floor(CAST(len(list_intersect(a.ns, b.ns)) AS DOUBLE)
                     / (len(a.ns) + len(b.ns)
                        - len(list_intersect(a.ns, b.ns)))
                     * 1000000 + 0.5) / 1000000 AS jaccard
        FROM e JOIN adj a ON a.src = e.pa
               JOIN adj b ON b.src = e.pb
    """,
    tags=("graph", "similarity"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor count and neighborhood Jaccard for every edge of
    the co-purchase graph — the classic link-strength / link-prediction
    feature pair ('how embedded is this relationship'): an edge whose
    endpoints share most of their neighborhoods is a community-internal
    tie; one with none is a bridge. Counts are exact set-intersection
    integers; Jaccard is one divide, 1e-6-rounded identically in both
    engines.

    Scale: adjacency lists materialize once per node (one groupBy on
    the support-thresholded edge list, whose degree is bounded by the
    MIN_SUPPORT co-occurrence filter — the same density argument as
    graph_triangle_count); each edge then probes two adjacency rows and
    the intersection is row-local array algebra. The quadratic
    neighbor-pair explosion never materializes."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(e.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    )
    adj = sym.groupBy("src").agg(F.array_sort(F.collect_set("dst")).alias("ns"))
    a = adj.select(F.col("src").alias("pa"), F.col("ns").alias("ns_a"))
    b = adj.select(F.col("src").alias("pb"), F.col("ns").alias("ns_b"))
    inter = F.size(F.array_intersect("ns_a", "ns_b"))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        e.join(a, "pa")
        .join(b, "pb")
        .select(
            "pa",
            "pb",
            inter.cast("bigint").alias("n_common"),
            F.size("ns_a").cast("bigint").alias("deg_a"),
            F.size("ns_b").cast("bigint").alias("deg_b"),
            r6(
                inter.cast("double")
                / (F.size("ns_a") + F.size("ns_b") - inter).cast("double")
            ).alias("jaccard"),
        )
    )


PAGERANK_EXACT_ITERS = 5
PR_SCALE = 1_000_000_000_000  # micro-unit fixed point: rank mass in 1e-12 units


def _pr_exact_oracle() -> str:
    """DuckDB mirror of the exact-integer power iteration: the fixed
    iteration count unrolls into chained CTEs (no recursion needed), and
    every step is integer div / exact sum / one double multiply by the
    damping constant floored back to integers — bit-identical across
    engines."""
    its = []
    prev = "it0"
    for k in range(1, PAGERANK_EXACT_ITERS + 1):
        its.append(f"""
        it{k} AS (
            SELECT s.dst AS node,
                   kv.k + CAST(floor(0.85 * SUM(i.r // d.deg)) AS BIGINT) AS r
            FROM {prev} i
            JOIN deg d ON d.src = i.node
            JOIN sym s ON s.src = i.node
            CROSS JOIN kv
            GROUP BY s.dst, kv.k)""")
        prev = f"it{k}"
    return f"""
        WITH {_DUCK_EDGES},
        sym AS (SELECT pa AS src, pb AS dst FROM e
                UNION ALL SELECT pb AS src, pa AS dst FROM e),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                FROM sym GROUP BY src),
        nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        kv AS (SELECT CAST(floor(0.15 * {PR_SCALE} / n) AS BIGINT) AS k FROM nv),
        it0 AS (SELECT d.src AS node, {PR_SCALE} // nv.n AS r
                FROM deg d CROSS JOIN nv),
        {", ".join(its)}
        SELECT node AS partkey, CAST(r AS BIGINT) AS rank_micro
        FROM {prev}
    """


@register(
    "graph_pagerank_exact",
    oracle=None,  # bound post-definition (oracle builder shares module CTEs)
    tags=("graph", "ml", "iterative"),
)
def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank as EXACT fixed-point arithmetic — the oracle-checkable
    form of graph_pagerank: rank mass lives in integer 1e-12 units, each
    iteration distributes r div deg along edges (integer division),
    sums exactly, and applies damping as one floored double multiply
    (0.85·S < 2^53, so the multiply is exact in both engines). Float
    PageRank can never hash-match across engines (summation order);
    this variant trades ~1e-12 of mass per node per iteration (the
    div/floor remainders) for bit-identical distributed results — the
    standard determinism trick for iterative fixpoints in this engine
    (cf. ml_naive_bayes micro-unit scores). graph_pagerank keeps the
    float form with its NumPy pin; both rank the same nodes.

    Scale: identical plan shape per round as graph_pagerank — one
    |E|-row join of the edge list against the |V|-row rank table, one
    map-side-combined sum by destination; the persisted edge list and
    degree table are loop-invariant."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(e.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .persist()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    try:
        n = deg.count()
        if n == 0:
            return deg.select(
                F.col("src").alias("partkey"),
                F.lit(0).cast("bigint").alias("rank_micro"),
            )
        k_const = int(0.15 * PR_SCALE / n)  # floor of the teleport term
        ranks = deg.select(
            F.col("src").alias("node"),
            F.lit(PR_SCALE // n).cast("bigint").alias("r"),
        )
        for _ in range(PAGERANK_EXACT_ITERS):
            contribs = (
                sym.join(deg, "src")
                .join(ranks.withColumnRenamed("node", "src"), "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("r div deg").alias("c"),
                )
            )
            ranks = contribs.groupBy("node").agg(
                (
                    F.lit(k_const)
                    + F.floor(F.lit(0.85) * F.sum("c").cast("double")).cast(
                        "bigint"
                    )
                ).alias("r")
            )
        return ranks.select(
            F.col("node").alias("partkey"), F.col("r").alias("rank_micro")
        )
    finally:
        sym.unpersist()
        deg.unpersist()


REGISTRY["graph_pagerank_exact"].oracle = _pr_exact_oracle()


# ---------------------------------------------------------------------------
# graph_k_core
# ---------------------------------------------------------------------------

K_CORE_K = 3
K_CORE_MAX_ITERS = 20  # safety bound; peeling converges long before


@register(
    "graph_k_core",
    oracle=None,  # iterative peeling to a data-dependent fixpoint —
    # pinned against a pure-Python k-core in tests/test_round6_semantics.py
    tags=("graph", "iterative"),
)
def graph_k_core(
    spark: SparkSession, sf_dir: str, k: int = K_CORE_K
) -> DataFrame:
    """The k-CORE of the co-purchase graph: the maximal subgraph in
    which every node keeps degree >= k — the classic cohesion screen
    (recommender seeds, spam-farm detection, community pre-filter)
    computed by iterative peeling: drop all nodes with degree < k,
    recompute degrees on the induced subgraph, repeat to fixpoint. The
    result is ORDER-INDEPENDENT (the k-core is unique), so peeling in
    whole rounds is both the parallel-friendly and the deterministic
    schedule. Returns the surviving nodes with their in-core degree.

    Scale: each round is one degree aggregate over the CURRENT edge
    list plus two semi-joins that shrink it — the edge list only ever
    loses rows, so the per-round cost is monotone decreasing; rounds
    are O(peeling depth) (a handful in practice, bounded here).
    Everything shuffles on node ids — |E| rows of two longs, never
    payloads; the fixpoint test is a 1-row count."""
    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint(eager=True)
    for _ in range(K_CORE_MAX_ITERS):
        deg = (
            e.select(F.col("pa").alias("n"))
            .unionAll(e.select(F.col("pb").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("n").localCheckpoint(eager=True)
        pruned = (
            e.join(keep.withColumnRenamed("n", "pa"), "pa", "left_semi")
            .join(keep.withColumnRenamed("n", "pb"), "pb", "left_semi")
            .localCheckpoint(eager=True)
        )
        if pruned.count() == e.count():
            e = pruned
            break
        e = pruned
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )
    return deg


def _k_core_oracle(k: int = K_CORE_K, rounds: int = K_CORE_MAX_ITERS) -> str:
    """Unrolled-CTE DuckDB oracle for k-core peeling: the peeling map is
    idempotent at its fixpoint, so unrolling the full safety bound of
    rounds (even after convergence) computes exactly the k-core the
    early-exiting Spark loop returns. MATERIALIZED stops DuckDB from
    inlining the round chain exponentially."""
    ctes = [f"""{_DUCK_EDGES.strip().rstrip()}, e0 AS MATERIALIZED (
            SELECT pa, pb FROM e)"""]
    for t in range(rounds):
        ctes.append(f"""k{t} AS MATERIALIZED (
            SELECT n FROM (
                SELECT pa AS n FROM e{t} UNION ALL SELECT pb FROM e{t})
            GROUP BY n HAVING count(*) >= {k}),
        e{t + 1} AS MATERIALIZED (
            SELECT pa, pb FROM e{t}
            WHERE pa IN (SELECT n FROM k{t})
              AND pb IN (SELECT n FROM k{t}))""")
    return (
        "WITH " + ",\n        ".join(ctes) + f"""
        SELECT node, core_degree FROM (
            SELECT n AS node, CAST(count(*) AS BIGINT) AS core_degree
            FROM (SELECT pa AS n FROM e{rounds}
                  UNION ALL SELECT pb FROM e{rounds})
            GROUP BY n)
        WHERE core_degree >= {k}"""
    )


REGISTRY["graph_k_core"].oracle = _k_core_oracle()


# ---------------------------------------------------------------------------
# graph_label_propagation
# ---------------------------------------------------------------------------

LPA_ITERS = 6  # fixed synchronous rounds: deterministic, oracle-unrollable


def _lpa_oracle(rounds: int = LPA_ITERS) -> str:
    """Unrolled-CTE oracle for synchronous label propagation. Sync LPA
    is NOT a fixpoint iteration (bipartite structures can oscillate), so
    determinism comes from running EXACTLY the same round count in both
    engines — no early exit on either side."""
    ctes = [
        f"""{_DUCK_EDGES.strip().rstrip()},
        adj AS MATERIALIZED (
            SELECT pa AS n, pb AS m FROM e
            UNION ALL SELECT pb, pa FROM e),
        l0 AS MATERIALIZED (
            SELECT DISTINCT n AS node, n AS lab FROM adj)"""
    ]
    for t in range(rounds):
        ctes.append(f"""c{t} AS MATERIALIZED (
            SELECT a.n, l.lab, count(*) AS cnt
            FROM adj a JOIN l{t} l ON a.m = l.node
            GROUP BY a.n, l.lab),
        l{t + 1} AS MATERIALIZED (
            SELECT c.n AS node, min(c.lab) AS lab
            FROM c{t} c JOIN (SELECT n, max(cnt) AS mc FROM c{t} GROUP BY n) b
              ON c.n = b.n AND c.cnt = b.mc
            GROUP BY c.n)""")
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"""
        SELECT node, lab AS community FROM l{rounds}"""
    )


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    tags=("graph", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan et
    al. 2007) over the co-purchase graph, made fully deterministic: every
    node starts labeled with its own id, and each round adopts the MOST
    FREQUENT label among its neighbors, ties broken by SMALLEST label —
    the argmax realized as (max-count per node) + (min label at that
    count), two grouped aggregates instead of any order-dependent
    arg_max. Both engines run EXACTLY LPA_ITERS rounds (sync LPA can
    oscillate, so no early exit anywhere); the per-node community output
    is therefore partition- and engine-invariant.

    Scale: the adjacency (both directions) is built once and each round
    is one |E|-keyed join against the |V|-row label table plus two
    grouped aggregates — the textbook distributed LPA schedule, linear
    per round, labels are single longs. Rounds are bounded (label
    propagation converges in a few sweeps on social-like graphs)."""
    e = _edges(spark, sf_dir)
    adj = (
        e.select(F.col("pa").alias("n"), F.col("pb").alias("m"))
        .unionAll(e.select(F.col("pb").alias("n"), F.col("pa").alias("m")))
        .localCheckpoint(eager=True)
    )
    lab = adj.select(F.col("n").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(LPA_ITERS):
        cnt = (
            adj.join(lab.withColumnRenamed("node", "m"), "m")
            .groupBy("n", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = cnt.groupBy("n").agg(F.max("cnt").alias("mc"))
        lab = (
            cnt.join(best, "n")
            .filter(F.col("cnt") == F.col("mc"))
            .groupBy("n")
            .agg(F.min("lab").alias("lab"))
            .select(F.col("n").alias("node"), "lab")
            .localCheckpoint(eager=True)
        )
    return lab.select("node", F.col("lab").alias("community"))


# ---------------------------------------------------------------------------
# recsys_item_knn
# ---------------------------------------------------------------------------

ITEM_KNN_K = 5
_SQ_SCALE = 1_000_000_000_000  # squared-cosine fixed-point scale (1e-12)


@register(
    "recsys_item_knn",
    oracle=f"""
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        occ AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY p),
        pair AS (
            SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS c
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {MIN_SUPPORT}),
        nbr AS (
            SELECT pa AS item, pb AS neighbor, c FROM pair
            UNION ALL SELECT pb, pa, c FROM pair),
        scored AS (
            SELECT n.item, n.neighbor, n.c,
                   CAST((CAST(n.c AS HUGEINT) * n.c * {_SQ_SCALE})
                        // (oa.n * CAST(ob.n AS HUGEINT)) AS BIGINT) AS cos_sq_pico
            FROM nbr n
            JOIN occ oa ON oa.p = n.item
            JOIN occ ob ON ob.p = n.neighbor),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY item
                       ORDER BY cos_sq_pico DESC, neighbor) AS rk
            FROM scored)
        SELECT item, neighbor, c AS n_cobaskets, cos_sq_pico,
               CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {ITEM_KNN_K}
    """,
    tags=("graph", "similarity", "analytics"),
)
def recsys_item_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering (the Amazon 2003 recommender
    shape): for every part, the top-k most similar parts by cosine over
    binary basket-incidence vectors — cos(a,b) = c(a,b)/sqrt(n(a)n(b))
    with c from co-purchase counts and n from basket occurrence. Ranking
    uses the EXACT INTEGER squared cosine (c^2 * 1e12) div (n_a * n_b)
    (monotone in cosine since all terms are positive), so the top-k
    boundary never depends on float ulps; ties break on neighbor id.

    Scale: the same one-orderkey-shuffle basket pair expansion as
    _edges (hot-basket cap bounds the quadratic), then everything is
    keyed joins on item ids — occurrence table joins by part key,
    per-item top-k is one row_number window on the pair-partitioned
    key. No broadcast of data-sized sides; products ride DECIMAL(38)/
    HUGEINT so a billion-basket corpus cannot overflow."""
    li = load_table(spark, sf_dir, "lineitem")
    # materialized once: occurrence counts AND baskets both consume the
    # deduped incidence list — un-materialized, each re-ran the scan +
    # distinct shuffle (r11 plan sweep: 4 lineitem scans per call).
    # MEMORY TRADE (explicit): the incidence list is DATA-sized (2
    # narrow ints per basket line); kept because the distinct shuffle
    # it saves is a full-data exchange, strictly more bytes than the pin
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct().localCheckpoint(eager=True)
    occ = op.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    baskets = (
        op.groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(ps, (x, i) ->
                        transform(slice(ps, i + 2, size(ps) - i - 1),
                                  y -> struct(x AS pa, y AS pb))))
                    """
                )
            ).alias("e")
        )
        .select("e.pa", "e.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .filter(F.col("c") >= MIN_SUPPORT)
        # pinned: the symmetrization union consumes it twice, and the
        # basket pair expansion is the expensive leg of this op.
        # MEMORY TRADE (explicit): the pair table is OUTPUT-sized
        # (co-occurring item pairs above MIN_SUPPORT) — bounded by the
        # support threshold, not by |data|, but it grows with catalog
        # density; re-expanding baskets twice is always worse
        .localCheckpoint(eager=True)
    )
    nbr = pair.select(
        F.col("pa").alias("item"), F.col("pb").alias("neighbor"), "c"
    ).unionAll(
        pair.select(F.col("pb").alias("item"), F.col("pa").alias("neighbor"), "c")
    )
    scored = (
        nbr.join(occ.select(F.col("p").alias("item"), F.col("n").alias("na")), "item")
        .join(
            occ.select(F.col("p").alias("neighbor"), F.col("n").alias("nb")),
            "neighbor",
        )
        .select(
            "item",
            "neighbor",
            "c",
            F.expr(
                f"cast((cast(c as decimal(38,0)) * c * {_SQ_SCALE})"
                " div (na * cast(nb as decimal(38,0))) as bigint)"
            ).alias("cos_sq_pico"),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("item").orderBy(F.col("cos_sq_pico").desc(), "neighbor")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= ITEM_KNN_K)
        .select(
            "item",
            "neighbor",
            F.col("c").alias("n_cobaskets"),
            "cos_sq_pico",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# graph_adamic_adar
# ---------------------------------------------------------------------------


@register(
    "graph_adamic_adar",
    oracle=f"""
        WITH {_DUCK_EDGES},
        sym AS (SELECT pa AS n, pb AS m FROM e
                UNION ALL SELECT pb, pa FROM e),
        deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY n),
        w AS (
            SELECT s1.m AS a, s2.m AS b, s1.n AS z
            FROM sym s1 JOIN sym s2 ON s1.n = s2.n AND s1.m < s2.m),
        t AS (
            SELECT w.a, w.b,
                   CAST(SUM(CAST(floor(1000000000 / ln(deg.d)) AS BIGINT))
                        AS BIGINT) AS aa,
                   CAST(count(*) AS BIGINT) AS nc
            FROM w JOIN deg ON deg.n = w.z
            WHERE deg.d >= 2
            GROUP BY w.a, w.b)
        SELECT e.pa, e.pb, t.aa AS aa_nano, t.nc AS n_common
        FROM e JOIN t ON t.a = e.pa AND t.b = e.pb
    """,
    tags=("graph", "similarity"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC–ADAR link strength for every co-purchase edge: common
    neighbors weighted by 1/ln(degree) so a shared RARE neighbor counts
    far more than a shared hub — the refinement of
    graph_common_neighbors' raw count that wins most link-prediction
    benchmarks. Per-wedge terms are FLOORED NANO-INTS
    (floor(1e9/ln(deg))), so the per-pair sums are exact integer folds
    in any partitioning; ln agreement across engines is already pinned
    by the entropy family.

    Scale: wedges enumerate per CENTER from the support-thresholded
    adjacency (bounded degree, same argument as graph_triangle_count);
    the pair rollup and the edge join shuffle only (a, b, term) longs.
    Degree-1 centers produce no wedges; deg >= 2 keeps ln positive."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("pa").alias("n"), F.col("pb").alias("m"))
        .unionAll(e.select(F.col("pb").alias("n"), F.col("pa").alias("m")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    w = (
        sym.alias("s1")
        .join(
            sym.alias("s2"),
            (F.col("s1.n") == F.col("s2.n")) & (F.col("s1.m") < F.col("s2.m")),
        )
        .select(
            F.col("s1.m").alias("a"), F.col("s2.m").alias("b"), F.col("s1.n").alias("z")
        )
    )
    t = (
        w.join(deg.withColumnRenamed("n", "z"), "z")
        .filter(F.col("d") >= 2)
        .select(
            "a",
            "b",
            F.floor(F.lit(1_000_000_000) / F.log(F.col("d").cast("double")))
            .cast("bigint")
            .alias("term"),
        )
        .groupBy("a", "b")
        .agg(
            F.sum("term").alias("aa_nano"),
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
        )
    )
    return e.join(
        t, (e.pa == t.a) & (e.pb == t.b)
    ).select("pa", "pb", "aa_nano", "n_common")


# ---------------------------------------------------------------------------
# graph_clustering_coefficient
# ---------------------------------------------------------------------------


@register(
    "graph_clustering_coefficient",
    oracle=f"""
        WITH {_DUCK_EDGES},
        tri AS (
            SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
            FROM e e1
            JOIN e e2 ON e2.pa = e1.pb
            JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        pertri AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri),
        tcnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
                 FROM pertri GROUP BY node),
        deg AS (
            SELECT n AS node, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e)
            GROUP BY n)
        SELECT deg.node, deg.d AS degree,
               COALESCE(tcnt.n_tri, 0) AS n_triangles,
               CAST((CAST(COALESCE(tcnt.n_tri, 0) AS HUGEINT) * 2000000)
                    // (CAST(deg.d AS HUGEINT) * (deg.d - 1))
                    AS BIGINT) AS cc_micro
        FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
        WHERE deg.d >= 2
    """,
    tags=("graph",),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL CLUSTERING COEFFICIENT per node: the fraction of a node's
    neighbor pairs that are themselves connected — cc = 2T / d(d-1) —
    the node-level cohesion readout whose average is the global
    'small-world' statistic (graph_triangle_count is the corpus total;
    this attributes each triangle to its three corners). Scored as
    exact integer micro-units via multiply-before-divide; degree-1
    nodes (undefined cc) are excluded rather than zero-filled.

    Scale: the same canonically-oriented (a<b<c) triangle join as
    graph_triangle_count — each triangle produced exactly once, then a
    3-way row-local unpivot attributes corners; shuffles carry node ids
    only. Degree bound comes from the MIN_SUPPORT threshold, same as
    every op in this module."""
    e = _edges(spark, sf_dir)
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    pertri = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcnt = pertri.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    )
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return (
        deg.join(tcnt, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"),
            # DECIMAL products (oracle: HUGEINT): a 3M-degree hub has
            # n_tri ~ 4.6e12 and d(d-1) ~ 9e12 — the int64 edge
            F.expr(
                "cast((cast(coalesce(n_tri, 0) as decimal(38,0)) * 2000000)"
                " div (cast(degree as decimal(38,0)) * (degree - 1))"
                " as bigint)"
            ).alias("cc_micro"),
        )
    )


# ---------------------------------------------------------------------------
# graph_assortativity
# ---------------------------------------------------------------------------


@register(
    "graph_assortativity",
    oracle=f"""
        WITH {_DUCK_EDGES},
        deg AS (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e)
            GROUP BY n),
        p AS (
            SELECT da.d AS x, db.d AS y FROM e
            JOIN deg da ON da.n = e.pa JOIN deg db ON db.n = e.pb
            UNION ALL
            SELECT db.d, da.d FROM e
            JOIN deg da ON da.n = e.pa JOIN deg db ON db.n = e.pb),
        s AS (
            SELECT CAST(count(*) AS HUGEINT) AS n,
                   SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(y AS HUGEINT) * y) AS syy
            FROM p)
        SELECT CAST(n / 2 AS BIGINT) AS n_edges,
               floor(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                     / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                            * CAST(CAST(n * syy - sy * sy AS VARCHAR)
                                   AS DOUBLE))
                     * 1000000000 + 0.5) / 1000000000 AS assortativity
        FROM s
    """,
    tags=("graph", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002): the Pearson correlation of
    endpoint degrees over all edges — positive means hubs prefer hubs
    (social networks), negative means hubs bind to leaves
    (technological nets) — the one-number structural fingerprint of the
    co-purchase graph. Each undirected edge contributes BOTH endpoint
    orderings (the standard symmetrization, so the measure is
    direction-free), and the correlation runs on exact
    HUGEINT/DECIMAL(38) degree suffstats; only the final r is a double
    (1e-9 round).

    Scale: two keyed joins decorate the edge list with endpoint
    degrees; everything after is one combinable suffstat pass to a
    1-row final (allowlisted)."""
    e = _edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("n"))
        .unionAll(e.select(F.col("pb").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("pa"), F.col("d").alias("da")), "pa")
        .join(deg.select(F.col("n").alias("pb"), F.col("d").alias("db")), "pb")
        .select("da", "db")
    )
    p = ed.select(F.col("da").alias("x"), F.col("db").alias("y")).unionAll(
        ed.select(F.col("db").alias("x"), F.col("da").alias("y"))
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = p.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38("x")).alias("sx"),
        F.sum(d38("y")).alias("sy"),
        F.sum(d38("x") * F.col("y")).alias("sxy"),
        F.sum(d38("x") * F.col("x")).alias("sxx"),
        F.sum(d38("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.expr("cast(n / 2 as bigint)").alias("n_edges"),
        (
            F.floor(num / F.sqrt(dx * dy) * 1_000_000_000 + F.lit(0.5))
            / 1_000_000_000
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# graph_ppr_exact
# ---------------------------------------------------------------------------

PPR_SEEDS_K = 3  # personalize around the 3 smallest node ids
PPR_ITERS = 5


def _ppr_oracle() -> str:
    k_const = int(0.15 * PR_SCALE / PPR_SEEDS_K)
    its = []
    prev = "p0"
    for k in range(1, PPR_ITERS + 1):
        its.append(f"""
        p{k} AS (
            SELECT s.dst AS node,
                   CASE WHEN s.dst IN (SELECT node FROM seeds)
                        THEN {k_const} ELSE 0 END
                   + CAST(floor(0.85 * SUM(i.r // d.deg)) AS BIGINT) AS r
            FROM {prev} i
            JOIN deg d ON d.src = i.node
            JOIN sym s ON s.src = i.node
            GROUP BY s.dst)""")
        prev = f"p{k}"
    return f"""
        WITH {_DUCK_EDGES},
        sym AS (SELECT pa AS src, pb AS dst FROM e
                UNION ALL SELECT pb AS src, pa AS dst FROM e),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                FROM sym GROUP BY src),
        seeds AS (SELECT src AS node FROM deg ORDER BY src
                  LIMIT {PPR_SEEDS_K}),
        p0 AS (SELECT d.src AS node,
                      CASE WHEN d.src IN (SELECT node FROM seeds)
                           THEN {PR_SCALE // PPR_SEEDS_K} ELSE 0 END AS r
               FROM deg d),
        {", ".join(its)}
        SELECT node AS partkey, CAST(r AS BIGINT) AS ppr_micro
        FROM {prev} WHERE r > 0
    """


@register(
    "graph_ppr_exact",
    oracle=_ppr_oracle(),
    tags=("graph", "ml", "iterative"),
)
def graph_ppr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank in exact fixed-point arithmetic: all rank
    mass starts on a 3-node seed set and the teleport returns there
    every round (rather than spreading uniformly), so the converged
    mass measures proximity TO THE SEEDS — the similar-items /
    who-to-recommend primitive behind pinterest-style related-pins
    (graph_pagerank_exact ranks global importance; this ranks
    importance relative to an interest set). Same exactness contract:
    integer 1e-12 rank units, r div deg integer distribution, one
    floored double multiply per round (0.85*S < 2^53), teleport only
    on seed rows — bit-identical across engines and reshards. Nodes
    never reached keep rank 0 and drop from the output.

    Scale: per round one |E|-keyed join + map-combined sum, identical
    to graph_pagerank_exact; the seed set is a LIMIT-k head of the
    node table (broadcast), and restarting mass on seeds is what keeps
    PPR local — untouched components never enter the frontier."""
    from pyspark.sql import Window as W

    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(e.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    seeds = (
        deg.select(F.col("src").alias("node"))
        .orderBy("node")
        .limit(PPR_SEEDS_K)
        .localCheckpoint(eager=True)
    )
    k_const = int(0.15 * PR_SCALE / PPR_SEEDS_K)
    ranks = deg.select(F.col("src").alias("node")).join(
        seeds.withColumn("seed", F.lit(1)), "node", "left"
    ).select(
        "node",
        F.when(F.col("seed").isNotNull(), F.lit(PR_SCALE // PPR_SEEDS_K))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("r"),
    )
    for _ in range(PPR_ITERS):
        contribs = (
            sym.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
        )
        summed = contribs.groupBy("node").agg(
            F.floor(F.lit(0.85) * F.sum("c").cast("double"))
            .cast("bigint")
            .alias("flow")
        )
        ranks = summed.join(
            F.broadcast(seeds.withColumn("seed", F.lit(1))), "node", "left"
        ).select(
            "node",
            (
                F.when(F.col("seed").isNotNull(), F.lit(k_const)).otherwise(
                    F.lit(0)
                )
                + F.col("flow")
            ).cast("bigint").alias("r"),
        ).localCheckpoint(eager=True)
    return ranks.filter(F.col("r") > 0).select(
        F.col("node").alias("partkey"), F.col("r").alias("ppr_micro")
    )


# ---------------------------------------------------------------------------
# recsys_covisitation
# ---------------------------------------------------------------------------

COVISIT_WINDOW_S = 3600  # co-visit horizon: items seen within 1 hour
COVISIT_TOPK = 20


@register(
    "recsys_covisitation",
    oracle=f"""
        WITH e AS (
            SELECT user_id, ts,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
            FROM events),
        pairs AS (
            SELECT a.item AS item_from, b.item AS item_to, count(*) AS c
            FROM e a JOIN e b
              ON a.user_id = b.user_id
             AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL 1 HOUR
             AND a.item <> b.item
            GROUP BY 1, 2),
        ranked AS (
            SELECT item_from, item_to, c,
                   row_number() OVER (ORDER BY c DESC, item_from, item_to)
                       AS rk
            FROM pairs)
        SELECT item_from, item_to, CAST(c AS BIGINT) AS n_covisits
        FROM ranked WHERE rk <= {COVISIT_TOPK}
    """,
    tags=("graph", "recsys", "events"),
)
def recsys_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional item co-visitation within a 1-hour horizon — the
    'users who viewed X then viewed Y within the hour' signal behind
    covisitation recommenders (the sequence-aware sibling of
    basket_association_rules' unordered baskets and recsys_item_knn's
    rating geometry). Top-COVISIT_TOPK pairs by count with a total
    (count, from, to) tie-break.

    Scale: the naive form is a per-user self-join with a range
    predicate — Catalyst would execute user-equi + range filter, fine
    per user but the matching frame is unbounded. Here the 1-hour
    horizon is made an EQUI key: the left side fans each event to its
    own and the next hour bucket (exactly 2 rows), the join runs on
    (user_id, hour_bucket), and the exact (0, 1h] micro-second window
    filters inside — the join_interval_bucketed technique, so matched
    frames are bounded by per-user-per-hour activity no matter the
    horizon's tail. One shuffle on the composite key; the pair rollup
    reduces to |item pairs| (item domain is bounded); final top-k is a
    single ordered limit."""
    from cdc_export_system_spark.functions.json_fns import PROPS_SCHEMA

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("item"),
    )
    win_us = COVISIT_WINDOW_S * 1_000_000
    hr = F.expr(f"us div {win_us}")
    a = ev.select(
        "user_id",
        F.col("us").alias("us_a"),
        F.col("item").alias("item_from"),
        F.explode(F.array(hr.cast("bigint"), (hr + 1).cast("bigint"))).alias(
            "hb"
        ),
    )
    b = ev.select(
        "user_id",
        hr.cast("bigint").alias("hb"),
        F.col("us").alias("us_b"),
        F.col("item").alias("item_to"),
    )
    pairs = (
        a.join(b, ["user_id", "hb"])
        .filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") <= F.col("us_a") + F.lit(win_us))
            & (F.col("item_from") != F.col("item_to"))
        )
        .groupBy("item_from", "item_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_covisits"))
    )
    return (
        pairs.orderBy(
            F.desc("n_covisits"), "item_from", "item_to"
        ).limit(COVISIT_TOPK)
    )
