"""Behavioral pins for the geo/spatial family: the cell-blocked near
join must equal the brute-force predicate join computed independently
in Spark, pairs must be found exactly once, and the grid index must
conserve the point count."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_export_system_spark.operators.geo import (
    CELL,
    KNN_K,
    R2,
    RADIUS,
    points,
)
from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def test_near_join_equals_brute_force(spark):
    """Cell blocking is an optimization, not a semantics change: the
    3x3-neighborhood join must return exactly the brute-force radius
    pairs (computed via a Spark range self-join here, independent of
    the DuckDB oracle)."""
    p = points(spark, SF_DIR)
    a = p.select(F.col("point_id").alias("id_a"), F.col("lat_u").alias("la"),
                 F.col("lon_u").alias("lo"))
    b = p.select(F.col("point_id").alias("id_b"), F.col("lat_u").alias("lb"),
                 F.col("lon_u").alias("lg"))
    d2 = (F.col("la") - F.col("lb")) * (F.col("la") - F.col("lb")) + (
        F.col("lo") - F.col("lg")
    ) * (F.col("lo") - F.col("lg"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(d2 <= R2)
        .select("id_a", "id_b", d2.cast("bigint").alias("dist2"))
    )
    fast = REGISTRY["geo_near_join"].fn(spark, SF_DIR)
    assert fast.exceptAll(brute).count() == 0
    assert brute.exceptAll(fast).count() == 0
    n = fast.count()
    assert n > 0, "radius join is vacuous at this scale — widen RADIUS"
    # exactly-once: no duplicate pairs from the neighborhood explode
    assert fast.select("id_a", "id_b").distinct().count() == n


def test_cell_index_conserves_points_and_bounds(spark):
    p = points(spark, SF_DIR)
    idx = REGISTRY["geo_cell_index"].fn(spark, SF_DIR)
    assert idx.agg(F.sum("n_points")).head()[0] == p.count()
    bad = idx.filter(
        (F.col("min_lat") < F.col("cell_lat") * CELL)
        | (F.col("max_lat") >= (F.col("cell_lat") + 1) * CELL)
        | (F.col("min_lon") < F.col("cell_lon") * CELL)
        | (F.col("max_lon") >= (F.col("cell_lon") + 1) * CELL)
    ).count()
    assert bad == 0  # every point's bbox sits inside its cell


def test_knn_ranks_are_true_nearest(spark):
    """Each probe's k results must be the k smallest distances over the
    whole corpus (checked per probe against a brute-force min)."""
    knn = REGISTRY["geo_knn"].fn(spark, SF_DIR).localCheckpoint()
    probes = knn.select("probe_id").distinct().count()
    assert probes > 1
    per_probe = knn.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("k"), F.max("dist2").alias("worst")
    )
    assert per_probe.filter(F.col("k") != KNN_K).count() == 0
    # no corpus point outside the result set may be closer than the
    # worst returned neighbor (ties broken by id are the only allowed
    # equality case)
    p = points(spark, SF_DIR)
    pr = points(spark, SF_DIR).select(
        F.col("point_id").alias("probe_id"),
        F.col("lat_u").alias("plat"),
        F.col("lon_u").alias("plon"),
    )
    d2 = (F.col("plat") - F.col("lat_u")) * (F.col("plat") - F.col("lat_u")) + (
        F.col("plon") - F.col("lon_u")
    ) * (F.col("plon") - F.col("lon_u"))
    closer = (
        per_probe.join(pr, "probe_id")
        .join(p, F.col("point_id") != F.col("probe_id"))
        .filter(d2 < F.col("worst"))
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_closer"))
        .filter(F.col("n_closer") > KNN_K)
    )
    assert closer.count() == 0


def test_radius_fits_neighborhood_invariant():
    assert RADIUS <= CELL, "3x3 neighborhood only covers radius <= cell"


def test_salted_near_join_identical_to_unsalted(spark):
    """Salting is a PHYSICAL remedy only: geo_near_join_salted must
    return exactly geo_near_join's pairs (every pair found once — the
    partner's home (cell, salt) sub-key is unique), while the salted
    plan splits hot cells across N_SALT join keys."""
    plain = REGISTRY["geo_near_join"].fn(spark, SF_DIR)
    salted = REGISTRY["geo_near_join_salted"].fn(spark, SF_DIR)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    n = salted.count()
    assert n == salted.select("id_a", "id_b").distinct().count()


def test_pruned_knn_identical_to_brute_knn(spark):
    """The expanding-ring serving path must return exactly the brute
    broadcast scan's top-k (same oracle, same rows — the stop rule
    ((r-1)*CELL)^2 is conservative, so no true neighbor can hide in an
    unvisited ring)."""
    brute = REGISTRY["geo_knn"].fn(spark, SF_DIR)
    pruned = REGISTRY["geo_knn_pruned"].fn(spark, SF_DIR)
    assert pruned.exceptAll(brute).count() == 0
    assert brute.exceptAll(pruned).count() == 0
    assert pruned.count() > 0


def test_adaptive_near_join_identical_and_prunes(spark):
    """Quadrant refinement is physical-only for RESULTS (identical
    pairs to geo_near_join, each found once) but, unlike salting, it
    must also PRUNE: the candidate volume entering the verify filter
    under the refined keys is strictly below the fixed-grid 3x3
    volume whenever any cell is hot."""
    from cdc_export_system_spark.operators.geo import (
        CELL,
        SPLIT_T,
        near_join_adaptive_plan,
        near_join_plan,
        points,
    )

    plain = REGISTRY["geo_near_join"].fn(spark, SF_DIR)
    adaptive = REGISTRY["geo_near_join_adaptive"].fn(spark, SF_DIR)
    assert adaptive.exceptAll(plain).count() == 0
    assert plain.exceptAll(adaptive).count() == 0
    n = adaptive.count()
    assert n == adaptive.select("id_a", "id_b").distinct().count()
    # the refined path must actually exercise at this SF
    p = points(spark, SF_DIR)
    hot = (
        p.groupBy(F.floor(F.col("lat_u") / CELL), F.floor(F.col("lon_u") / CELL))
        .count()
        .filter(F.col("count") >= SPLIT_T)
        .count()
    )
    assert hot > 0, "no hot cells at test SF: refined branch untested"


def test_adaptive_knn_identical_to_brute_knn(spark):
    """The adaptive-tile ring loop must return exactly the brute scan's
    top-k: ring enumeration and stop rule are unchanged from
    geo_knn_pruned, and tile pruning only drops tiles whose integer
    mindist² strictly exceeds the probe's current k-th distance — which
    cannot contain a displacing point even on d² ties."""
    brute = REGISTRY["geo_knn"].fn(spark, SF_DIR)
    adaptive = REGISTRY["geo_knn_adaptive"].fn(spark, SF_DIR)
    assert adaptive.exceptAll(brute).count() == 0
    assert brute.exceptAll(adaptive).count() == 0
    assert adaptive.count() > 0


def test_point_in_polygon_matches_independent_raycast(spark):
    """The registered parity plan must agree point-by-point with an
    INDEPENDENT pure-Python ray cast over the same integer polygons
    (collected per-point parity vs a reference that shares no Spark
    code), the polygons must be simple by construction (angularly
    ordered star), and containment must discriminate (neither 0 nor
    all points inside at sf0.01)."""
    from cdc_export_system_spark.operators.geo import (
        _PIP_DIRS,
        _PIP_SCALE,
        _pip_edges,
        geo_point_in_polygon,
    )

    def coordv(k, a, b, c):
        x = k % 999983
        return (a * x * x + b * x + c) % 1_000_003

    def polygon(nk):
        cx, cy = coordv(nk, 7, 17, 5) * 12, coordv(nk, 11, 19, 3) * 12
        return [
            (
                cx + dx * _PIP_SCALE * (6 + (nk * 7 + v * 13) % 10),
                cy + dy * _PIP_SCALE * (6 + (nk * 7 + v * 13) % 10),
            )
            for v, (dx, dy) in enumerate(_PIP_DIRS)
        ]

    def ref_inside(px, py, pg):
        c = 0
        for i in range(len(pg)):
            x1, y1 = pg[i]
            x2, y2 = pg[(i + 1) % len(pg)]
            if (y1 > py) != (y2 > py):
                t = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
                if (t < 0) if y2 > y1 else (t > 0):
                    c ^= 1
        return c

    # per-nation reference aggregate over the exact point derivation
    pts = points(spark, SF_DIR).collect()
    ref = {}
    for r in pts:
        nk = r["c_nationkey"]
        i = ref_inside(r["lon_u"], r["lat_u"], polygon(nk))
        a = ref.setdefault(nk, [0, 0, 0, 0])
        a[0] += 1
        a[1] += i
        a[2] += i * r["lat_u"]
        a[3] += i * r["lon_u"]
    got = {
        r["c_nationkey"]: (
            r["n_points"], r["n_inside"],
            r["sum_inside_lat"], r["sum_inside_lon"],
        )
        for r in geo_point_in_polygon(spark, SF_DIR).collect()
    }
    assert got == {nk: tuple(v) for nk, v in ref.items()}
    # Discrimination check at sf0.01 (pure-Python reference only): the
    # sf0.001 key range 1..150 maps near the lattice origin, where the
    # polygons cover everything — at sf0.01 containment must be a real
    # filter (neither empty nor total; measured ~18%).
    import duckdb

    rows = duckdb.sql(
        "SELECT c_custkey, c_nationkey FROM "
        "read_parquet('/root/testdata/sf0.01/customer.parquet')"
    ).fetchall()
    n = len(rows)
    ins = sum(
        ref_inside(
            coordv(ck, 5, 13, 2) * 12, coordv(ck, 3, 7, 11) * 12,
            polygon(nk),
        )
        for ck, nk in rows
    )
    assert 0 < ins < n  # discriminates
    # polygon edge set: 12 directed edges per nation, closed ring
    edges = _pip_edges(spark, SF_DIR).collect()
    per = {}
    for e in edges:
        per.setdefault(e["nationkey"], []).append(e)
    for nk, es in per.items():
        assert len(es) == 12
        starts = {(e["x1"], e["y1"]) for e in es}
        ends = {(e["x2"], e["y2"]) for e in es}
        assert starts == ends  # every edge end is another edge's start


def test_contains_join_refine_subset_and_cross_reference(spark):
    """Filter-refine invariants: every contained (point, polygon) pair
    must also be a bbox candidate (refine is a strict filter of the
    bbox phase), the own-nation slice of the containment join must
    agree with geo_point_in_polygon's parity, and the pair set must
    match an independent pure-Python sweep over all polygons."""
    from cdc_export_system_spark.operators.geo import (
        _PIP_DIRS,
        _PIP_SCALE,
        geo_contains_join,
    )

    def coordv(k, a, b, c):
        x = k % 999983
        return (a * x * x + b * x + c) % 1_000_003

    def polygon(nk):
        cx, cy = coordv(nk, 7, 17, 5) * 12, coordv(nk, 11, 19, 3) * 12
        return [
            (
                cx + dx * _PIP_SCALE * (6 + (nk * 7 + v * 13) % 10),
                cy + dy * _PIP_SCALE * (6 + (nk * 7 + v * 13) % 10),
            )
            for v, (dx, dy) in enumerate(_PIP_DIRS)
        ]

    def ref_inside(px, py, pg):
        c = 0
        for i in range(len(pg)):
            x1, y1 = pg[i]
            x2, y2 = pg[(i + 1) % len(pg)]
            if (y1 > py) != (y2 > py):
                t = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
                if (t < 0) if y2 > y1 else (t > 0):
                    c ^= 1
        return c

    nations = sorted(
        r["c_nationkey"]
        for r in points(spark, SF_DIR).select("c_nationkey").distinct().collect()
    )
    polys = {nk: polygon(nk) for nk in nations}
    bboxes = {
        nk: (
            min(x for x, _ in pg), max(x for x, _ in pg),
            min(y for _, y in pg), max(y for _, y in pg),
        )
        for nk, pg in polys.items()
    }
    ref = {}
    for r in points(spark, SF_DIR).collect():
        for nk, pg in polys.items():
            minx, maxx, miny, maxy = bboxes[nk]
            if minx <= r["lon_u"] <= maxx and miny <= r["lat_u"] <= maxy:
                a = ref.setdefault(nk, [0, 0, 0])
                i = ref_inside(r["lon_u"], r["lat_u"], pg)
                a[0] += 1
                a[1] += i
                a[2] += i * r["point_id"]
    got = {
        r["nationkey"]: (
            r["n_bbox_candidates"], r["n_contained"], r["sum_contained_ids"]
        )
        for r in geo_contains_join(spark, SF_DIR).collect()
    }
    assert got == {nk: tuple(v) for nk, v in ref.items()}
    for nk, (n_cand, n_in, _s) in got.items():
        assert n_in <= n_cand  # refine is a subset of the bbox phase
