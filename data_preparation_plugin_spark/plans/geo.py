"""Geometry capability queries: spatial predicates over synthesized points.

The reference's spatial story is "load shapefiles into PostGIS, query
there" (reference ``operators/shp2pgsql.py:13-27``). The ingest half lives
in ``operators/shapefile.py``; these queries cover the query half with the
predicates from ``functions/geo.py``. The fixture tables carry no
coordinates, so points and region boxes are synthesized as pure integer
arithmetic over ``customer`` / ``nation`` keys — deterministic, exact in
IEEE doubles, and reproducible in the DuckDB oracle, which verifies the
*join result*, proving the grid blocking lossless (a point dropped or
duplicated by the cell join would hash-fail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_preparation_plugin_spark.functions.geo import (
    covering_cells,
    grid_blocked_join,
    grid_cell,
    planar_distance_sq,
    point_in_polygon,
    polygon_wkt,
    wkt_polygon_vertices,
)
from data_preparation_plugin_spark.plans.registry import load_table, register


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic lon/lat per customer (exact double arithmetic)."""
    k = F.col("c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((k % 360) - 180 + ((k * 7919) % 1000) / 1000.0).alias("x"),
        (((k * 31) % 180) - 90 + ((k * 104729) % 1000) / 1000.0).alias("y"),
    )


def _boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 13.5°x6.5° bbox per nation, disjoint bands by construction."""
    n = F.col("n_nationkey")
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        (n * 14.0 - 180).alias("min_x"),
        (n * 7.0 - 90).alias("min_y"),
        (n * 14.0 - 166.5).alias("max_x"),
        (n * 7.0 - 83.5).alias("max_y"),
    )


@register(
    "geo_point_in_region",
    category="geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 360) - 180
                   + ((c_custkey * 7919) % 1000) / 1000.0  AS x,
               ((c_custkey * 31) % 180) - 90
                   + ((c_custkey * 104729) % 1000) / 1000.0 AS y
        FROM customer
    ), boxes AS (
        SELECT n_nationkey,
               n_nationkey * 14.0 - 180   AS min_x,
               n_nationkey * 7.0 - 90     AS min_y,
               n_nationkey * 14.0 - 166.5 AS max_x,
               n_nationkey * 7.0 - 83.5   AS max_y
        FROM nation
    )
    SELECT p.c_custkey,
           b.n_nationkey AS region_key,
           p.x,
           p.y,
           (p.x - (b.min_x + 6.75)) * (p.x - (b.min_x + 6.75))
         + (p.y - (b.min_y + 3.25)) * (p.y - (b.min_y + 3.25)) AS dist2_center
    FROM pts p
    JOIN boxes b
      ON p.x >= b.min_x AND p.x <= b.max_x
     AND p.y >= b.min_y AND p.y <= b.max_y
    """,
)
def geo_point_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-bbox spatial join through grid blocking.

    Spark side runs the scale path — regions exploded to covering grid
    cells, points keyed by cell, hash equi-join, exact containment filter
    — while the oracle runs the naive theta join. A hash match therefore
    proves the blocking is lossless, not just that the predicate is right.
    Distance to the region centre is squared planar (pure multiply/add,
    bit-exact both engines); great-circle distance is available as
    ``functions.geo.haversine_km`` and tolerance-tested in pytest.
    """
    joined = grid_blocked_join(
        _points(spark, sf_dir), _boxes(spark, sf_dir)
    )
    cx = F.col("min_x") + 6.75
    cy = F.col("min_y") + 3.25
    return joined.select(
        "c_custkey",
        F.col("n_nationkey").alias("region_key"),
        "x",
        "y",
        planar_distance_sq(F.col("x"), F.col("y"), cx, cy).alias(
            "dist2_center"
        ),
    )


def _diamond_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One diamond (rotated-square) polygon per nation, as WKT text.

    Centred in the nation's bbox band (see :func:`_boxes`) with
    half-diagonals 6.75°x3.25°, built as a closed 5-vertex ring and
    rendered to WKT — the engine's geometry representation — so the query
    exercises the full text round trip: numbers → WKT → parsed vertex
    arrays. All vertex coordinates are exact in IEEE doubles and Spark's
    double↔string casts round-trip exactly.
    """
    n = F.col("n_nationkey")
    cx = n * 14.0 - 173.0
    cy = n * 7.0 - 86.75
    xs = F.array(cx - 6.75, cx, cx + 6.75, cx, cx - 6.75)
    ys = F.array(cy, cy - 3.25, cy, cy + 3.25, cy)
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", polygon_wkt(xs, ys).alias("geometry")
    )


@register(
    "geo_point_in_polygon",
    category="geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 360) - 180
                   + ((c_custkey * 7919) % 1000) / 1000.0  AS x,
               ((c_custkey * 31) % 180) - 90
                   + ((c_custkey * 104729) % 1000) / 1000.0 AS y
        FROM customer
    ), polys AS (
        SELECT n_nationkey,
               [n_nationkey * 14.0 - 179.75, n_nationkey * 14.0 - 173.0,
                n_nationkey * 14.0 - 166.25, n_nationkey * 14.0 - 173.0,
                n_nationkey * 14.0 - 179.75]                 AS xs,
               [n_nationkey * 7.0 - 86.75, n_nationkey * 7.0 - 90.0,
                n_nationkey * 7.0 - 86.75, n_nationkey * 7.0 - 83.5,
                n_nationkey * 7.0 - 86.75]                   AS ys
        FROM nation
    )
    SELECT p.c_custkey,
           q.n_nationkey AS region_key,
           p.x,
           p.y
    FROM pts p, polys q
    WHERE len(list_filter(range(1, len(q.xs)), i ->
              ((q.ys[i] > p.y) != (q.ys[i+1] > p.y))
              AND (p.x < q.xs[i]
                   + (q.xs[i+1] - q.xs[i]) * (p.y - q.ys[i])
                     / (q.ys[i+1] - q.ys[i])))) % 2 = 1
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ray-cast point-in-polygon join through the same grid blocking.

    Completes PostGIS query-half parity for non-rectangular regions
    (reference ``operators/shp2pgsql.py:13-27``): polygons arrive as WKT
    text (the shapefile reader's output format), are parsed to vertex
    arrays JVM-side, and the exact predicate is the higher-order
    ray-casting filter — no UDF anywhere. Spark runs the scale path
    (covering-cell explode → broadcast hash join → exact predicate);
    the oracle runs the naive cross join with the *identical* crossing
    formula via DuckDB list lambdas, so a hash match proves the grid
    blocking lossless for polygon shapes, not just bboxes.
    """
    polys = _diamond_wkt(spark, sf_dir)
    xs, ys = wkt_polygon_vertices(F.col("geometry"))
    regions = polys.select(
        "n_nationkey",
        xs.alias("xs"),
        ys.alias("ys"),
        F.array_min(xs).alias("min_x"),
        F.array_min(ys).alias("min_y"),
        F.array_max(xs).alias("max_x"),
        F.array_max(ys).alias("max_y"),
    )
    joined = grid_blocked_join(
        _points(spark, sf_dir),
        regions,
        predicate=point_in_polygon(
            F.col("x"), F.col("y"), F.col("xs"), F.col("ys")
        ),
    )
    return joined.select(
        "c_custkey",
        F.col("n_nationkey").alias("region_key"),
        "x",
        "y",
    )


@register(
    "geo_nearest_centroid",
    category="geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 360) - 180
                   + ((c_custkey * 7919) % 1000) / 1000.0  AS x,
               ((c_custkey * 31) % 180) - 90
                   + ((c_custkey * 104729) % 1000) / 1000.0 AS y
        FROM customer
    ), centers AS (
        SELECT n_nationkey,
               n_nationkey * 14.0 - 173.25 AS cx,
               n_nationkey * 7.0 - 86.75   AS cy
        FROM nation
    ), scored AS (
        SELECT p.c_custkey,
               c.n_nationkey,
               (p.x - c.cx) * (p.x - c.cx)
             + (p.y - c.cy) * (p.y - c.cy) AS dist2,
               row_number() OVER (
                   PARTITION BY p.c_custkey
                   ORDER BY (p.x - c.cx) * (p.x - c.cx)
                          + (p.y - c.cy) * (p.y - c.cy),
                            c.n_nationkey) AS rn
        FROM pts p CROSS JOIN centers c
    )
    SELECT c_custkey, n_nationkey AS nearest_nation, dist2
    FROM scored WHERE rn = 1
    """,
)
def geo_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment: reverse-geocode each point to a seat.

    The spatial-kNN shape (assign every point to its closest city/region
    seat): the seat list is dimension-sized, so it rides a broadcast
    nested loop and the argmin is an aggregate ``min`` over a
    (distance, key) struct — lexicographic struct ordering gives the
    deterministic smallest-key tiebreak, and partial aggregation
    collapses the |seats| candidates per point MAP-SIDE, so the one
    exchange carries a single row per point. Distances are exact IEEE
    doubles (integer-derived coordinates), no rounding needed.

    Scale shape: broadcast + map-side argmin — the same plan at any
    corpus size while the seat list stays dimension-sized; for
    million-seat lists this upgrades to the grid-blocked join
    (``functions/geo.py``) with per-cell argmin.
    """
    pts = _points(spark, sf_dir)
    centers = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        (F.col("n_nationkey") * 14.0 - 173.25).alias("cx"),
        (F.col("n_nationkey") * 7.0 - 86.75).alias("cy"),
    )
    dist2 = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) + (
        F.col("y") - F.col("cy")
    ) * (F.col("y") - F.col("cy"))
    return (
        pts.crossJoin(F.broadcast(centers))
        .select("c_custkey", F.struct(dist2.alias("d"), F.col("n_nationkey").alias("k")).alias("cand"))
        .groupBy("c_custkey")
        .agg(F.min("cand").alias("best"))
        .select(
            "c_custkey",
            F.col("best.k").alias("nearest_nation"),
            F.col("best.d").alias("dist2"),
        )
    )


#: Radius-join radius in degrees (squared for the exact predicate).
RADIUS_DEG = 3.0


def _supplier_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic lon/lat per supplier (exact double arithmetic),
    decorrelated from the customer point derivation."""
    s = F.col("s_suppkey")
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((s * 17) % 360) - 180 + ((s * 4447) % 1000) / 1000.0).alias("sx"),
        (((s * 13) % 180) - 90 + ((s * 7873) % 1000) / 1000.0).alias("sy"),
    )


@register(
    "geo_radius_pairs",
    category="geo",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 360) - 180
                   + ((c_custkey * 7919) % 1000) / 1000.0  AS x,
               ((c_custkey * 31) % 180) - 90
                   + ((c_custkey * 104729) % 1000) / 1000.0 AS y
        FROM customer
    ), sups AS (
        SELECT s_suppkey,
               ((s_suppkey * 17) % 360) - 180
                   + ((s_suppkey * 4447) % 1000) / 1000.0 AS sx,
               ((s_suppkey * 13) % 180) - 90
                   + ((s_suppkey * 7873) % 1000) / 1000.0 AS sy
        FROM supplier
    ), pairs AS (
        SELECT p.c_custkey, s.s_suppkey,
               (p.x - s.sx) * (p.x - s.sx)
             + (p.y - s.sy) * (p.y - s.sy) AS dist_sq
        FROM pts p CROSS JOIN sups s
        WHERE (p.x - s.sx) * (p.x - s.sx)
            + (p.y - s.sy) * (p.y - s.sy)
           <= {RADIUS_DEG} * {RADIUS_DEG}
    ), ranked AS (
        SELECT *,
               CAST(count(*) OVER (PARTITION BY c_custkey) AS BIGINT)
                   AS n_within,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY dist_sq, s_suppkey) AS rn
        FROM pairs
    )
    SELECT c_custkey, n_within,
           s_suppkey AS nearest_suppkey,
           dist_sq   AS nearest_dist_sq
    FROM ranked WHERE rn = 1
    """,
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join between two POINT SETS via grid blocking — never
    cartesian.

    The spatial shape the existing geo queries don't cover: both sides
    are point sets (customers x suppliers) and the predicate is a
    distance radius, the store-locator / supply-assignment join. Each
    supplier explodes to the grid cells covering its ±R box (bounded
    fan-out: ceil(2R/cell)² cells); each customer carries its single
    cell key; the equi-join on the cell key prunes to co-located pairs
    before the EXACT squared-distance predicate (pure multiply/add —
    bit-identical in the oracle, which proves the blocking lossless by
    hashing the full pair-derived result). Haversine would be the
    metric at planetary scale (``functions.geo.haversine_km``); the
    planar predicate keeps the oracle hashable and the plan identical.

    Scale shape: supplier side is dimension-sized here and broadcasts;
    at two planetary point sets both sides shuffle on the bounded
    integer cell key (``broadcast_regions=False``) and the join stays a
    hash join — cost proportional to co-located candidates, never
    |A|x|B|. The per-customer argmin is a map-side struct-min.
    """
    pts = _points(spark, sf_dir)
    sups = _supplier_points(spark, sf_dir).select(
        "s_suppkey", "sx", "sy",
        (F.col("sx") - RADIUS_DEG).alias("min_x"),
        (F.col("sy") - RADIUS_DEG).alias("min_y"),
        (F.col("sx") + RADIUS_DEG).alias("max_x"),
        (F.col("sy") + RADIUS_DEG).alias("max_y"),
    )
    dist_sq = planar_distance_sq(
        F.col("x"), F.col("y"), F.col("sx"), F.col("sy")
    )
    pairs = grid_blocked_join(
        pts, sups, predicate=dist_sq <= RADIUS_DEG * RADIUS_DEG
    ).select("c_custkey", "s_suppkey", dist_sq.alias("dist_sq"))
    return (
        pairs.groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min(
                F.struct(
                    F.col("dist_sq").alias("d"),
                    F.col("s_suppkey").alias("k"),
                )
            ).alias("best"),
        )
        .select(
            "c_custkey",
            "n_within",
            F.col("best.k").alias("nearest_suppkey"),
            F.col("best.d").alias("nearest_dist_sq"),
        )
    )


#: Standard geohash base32 alphabet (no a/i/l/o).
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
#: 6 characters = 30 bits = 15 bits per axis.
GEOHASH_BITS = 15


def _geohash_sql(x_expr: str, y_expr: str) -> str:
    """Geohash-6 as one engine-portable SQL expression.

    Quantize each axis to 15 bits, interleave with longitude first
    (the geohash bit layout), then map 5-bit chunks onto the standard
    base32 alphabet.  Pure integer arithmetic + substr — identical
    semantics in Spark SQL and DuckDB, which is what makes the oracle
    exact; reuses the Morton construction of ``layout.zorder_key_sql``
    with (lat, lon) argument order so longitude lands on the
    high-weight odd bit positions.
    """
    from data_preparation_plugin_spark.layout import zorder_key_sql

    scale = 1 << GEOHASH_BITS
    lon_q = (
        f"CAST(least(floor((({x_expr}) + 180.0) / 360.0 * {scale}),"
        f" {scale - 1}) AS BIGINT)"
    )
    lat_q = (
        f"CAST(least(floor((({y_expr}) + 90.0) / 180.0 * {scale}),"
        f" {scale - 1}) AS BIGINT)"
    )
    morton = zorder_key_sql(lat_q, lon_q, bits=GEOHASH_BITS)
    chunks = [
        f"substr('{GEOHASH_ALPHABET}',"
        f" CAST(((({morton}) >> {25 - 5 * k}) & 31) + 1 AS INTEGER), 1)"
        for k in range(6)
    ]
    return " || ".join(chunks)


@register(
    "geo_geohash_encode",
    category="geo",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 360) - 180
                   + ((c_custkey * 7919) % 1000) / 1000.0  AS x,
               ((c_custkey * 31) % 180) - 90
                   + ((c_custkey * 104729) % 1000) / 1000.0 AS y
        FROM customer
    ), hashed AS (
        SELECT c_custkey, {_geohash_sql("x", "y")} AS geohash
        FROM pts
    )
    SELECT substr(geohash, 1, 4) AS cell,
           CAST(count(*) AS BIGINT) AS n_points,
           min(geohash) AS sample_geohash,
           CAST(min(c_custkey) AS BIGINT) AS min_custkey
    FROM hashed
    GROUP BY 1
    """,
)
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-6 encoding + prefix-cell density (spatial binning).

    The string-prefix spatial index every lakehouse reaches for when no
    geo extension is installed: geohash cells nest by prefix, so ONE
    encoded column serves every aggregation granularity (substr = zoom
    out) and range-partitions geographically local points into the same
    files — the geo analogue of ``layout_zorder_bucket``, built on the
    same Morton construction.  Encoding is pure integer arithmetic
    shared verbatim between engines (``_geohash_sql``), so every
    character is engine-exact.  Output: per-4-char-cell density with a
    sample full-precision hash.

    Scale shape: the encode is a narrow per-row expression inside
    whole-stage codegen (no UDF, no join); the density aggregate is
    map-side-combinable on the bounded cell domain.  One scan.
    """
    pts = _points(spark, sf_dir)
    hashed = pts.select(
        "c_custkey", F.expr(_geohash_sql("x", "y")).alias("geohash")
    )
    return hashed.groupBy(
        F.substring("geohash", 1, 4).alias("cell")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("geohash").alias("sample_geohash"),
        F.min("c_custkey").cast("bigint").alias("min_custkey"),
    )


#: Half-size (degrees) of the per-supplier service box.
SUPPLIER_BOX_HALF_DEG = 1.5


def _supplier_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ±1.5° service box around each supplier's deterministic point."""
    return _supplier_points(spark, sf_dir).select(
        "s_suppkey",
        (F.col("sx") - SUPPLIER_BOX_HALF_DEG).alias("b_min_x"),
        (F.col("sy") - SUPPLIER_BOX_HALF_DEG).alias("b_min_y"),
        (F.col("sx") + SUPPLIER_BOX_HALF_DEG).alias("b_max_x"),
        (F.col("sy") + SUPPLIER_BOX_HALF_DEG).alias("b_max_y"),
    )


@register(
    "geo_bbox_overlap_join",
    category="geo",
    oracle="""
    WITH nb AS (
        SELECT n_nationkey,
               n_nationkey * 14.0 - 180 AS min_x,
               n_nationkey * 7.0  - 90  AS min_y,
               n_nationkey * 14.0 - 166.5 AS max_x,
               n_nationkey * 7.0  - 83.5  AS max_y
        FROM nation
    ), sb AS (
        SELECT s_suppkey,
               (((s_suppkey * 17) % 360) - 180
                + ((s_suppkey * 4447) % 1000) / 1000.0) - 1.5 AS b_min_x,
               (((s_suppkey * 13) % 180) - 90
                + ((s_suppkey * 7873) % 1000) / 1000.0) - 1.5 AS b_min_y,
               (((s_suppkey * 17) % 360) - 180
                + ((s_suppkey * 4447) % 1000) / 1000.0) + 1.5 AS b_max_x,
               (((s_suppkey * 13) % 180) - 90
                + ((s_suppkey * 7873) % 1000) / 1000.0) + 1.5 AS b_max_y
        FROM supplier
    )
    SELECT n.n_nationkey, s.s_suppkey,
           CAST(floor((least(n.max_x, s.b_max_x)
                       - greatest(n.min_x, s.b_min_x))
                    * (least(n.max_y, s.b_max_y)
                       - greatest(n.min_y, s.b_min_y)) * 1000000)
                AS BIGINT) AS overlap_area_e6
    FROM nb n JOIN sb s
      ON n.min_x <= s.b_max_x AND s.b_min_x <= n.max_x
     AND n.min_y <= s.b_max_y AND s.b_min_y <= n.max_y
    """,
)
def geo_bbox_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-overlap spatial join with REFERENCE-POINT dedup — no distinct.

    The polygon-overlay pre-join (which parcels might intersect which
    zones?) is a 2-D interval join: boxes overlap iff they overlap on
    BOTH axes.  Grid blocking makes it an equi-join — but unlike the
    point joins, BOTH sides explode to covering cells, so an
    overlapping pair co-occurs in every cell their boxes share and
    the naive join emits duplicates.  The classic fix is not
    ``distinct()`` (a full extra shuffle of the result): each
    candidate pair is emitted ONLY in the cell containing its
    overlap's min corner (``greatest(min_xs), greatest(min_ys)`` —
    the reference point), a pure predicate, so the join output is
    exact with zero post-dedup.  The unblocked quadratic oracle
    proves the blocking + reference-point discipline lossless.
    Overlap area ships as an e6 integer computed with the same
    least/greatest expression in both engines.

    Scale shape: both sides shuffle (or broadcast, dimension-sized
    here) on the bounded integer cell key; per-cell work is
    candidate-proportional; no distinct, no cartesian, no window.
    """
    nb = _boxes(spark, sf_dir).select(
        "n_nationkey",
        F.col("min_x"),
        F.col("min_y"),
        F.col("max_x"),
        F.col("max_y"),
        F.explode(
            covering_cells(
                F.col("min_x"), F.col("min_y"),
                F.col("max_x"), F.col("max_y"),
            )
        ).alias("__cell"),
    )
    sb = _supplier_boxes(spark, sf_dir).select(
        "s_suppkey",
        "b_min_x",
        "b_min_y",
        "b_max_x",
        "b_max_y",
        F.explode(
            covering_cells(
                F.col("b_min_x"), F.col("b_min_y"),
                F.col("b_max_x"), F.col("b_max_y"),
            )
        ).alias("__cell"),
    )
    ref_x = F.greatest(F.col("min_x"), F.col("b_min_x"))
    ref_y = F.greatest(F.col("min_y"), F.col("b_min_y"))
    overlap = (
        (F.col("min_x") <= F.col("b_max_x"))
        & (F.col("b_min_x") <= F.col("max_x"))
        & (F.col("min_y") <= F.col("b_max_y"))
        & (F.col("b_min_y") <= F.col("max_y"))
    )
    return (
        sb.join(F.broadcast(nb), "__cell")
        .filter(overlap & (grid_cell(ref_x, ref_y) == F.col("__cell")))
        .select(
            "n_nationkey",
            "s_suppkey",
            F.floor(
                (
                    F.least(F.col("max_x"), F.col("b_max_x"))
                    - F.greatest(F.col("min_x"), F.col("b_min_x"))
                )
                * (
                    F.least(F.col("max_y"), F.col("b_max_y"))
                    - F.greatest(F.col("min_y"), F.col("b_min_y"))
                )
                * 1000000
            )
            .cast("bigint")
            .alias("overlap_area_e6"),
        )
    )


#: Web-mercator zoom levels the rollup aggregates at (coarse -> fine).
TILE_ZOOMS = (2, 4, 6)
#: Mercator latitude clamp (the slippy-map projection's domain edge).
TILE_MAX_LAT = 85.05112878


@register(
    "geo_tile_rollup",
    category="geo",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 360) - 180
                   + ((c_custkey * 7919) % 1000) / 1000.0  AS x,
               ((c_custkey * 31) % 180) - 90
                   + ((c_custkey * 104729) % 1000) / 1000.0 AS y
        FROM customer
    ), zoomed AS (
        SELECT c_custkey, x,
               least(greatest(y, -{TILE_MAX_LAT}), {TILE_MAX_LAT}) AS yc,
               unnest([{", ".join(str(z) for z in TILE_ZOOMS)}]) AS zoom
        FROM pts
    )
    SELECT zoom,
           CAST(floor((x + 180.0) / 360.0 * (1 << zoom)) AS BIGINT) AS tile_x,
           CAST(floor(round(
               (1.0 - ln(tan(radians(yc)) + 1.0 / cos(radians(yc)))
                    / pi()) / 2.0 * (1 << zoom), 9)) AS BIGINT)     AS tile_y,
           CAST(count(*) AS BIGINT)      AS n_points,
           CAST(sum(c_custkey) AS BIGINT) AS custkey_checksum
    FROM zoomed
    GROUP BY zoom, tile_x, tile_y
    """,
)
def geo_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slippy-map (web-mercator) tile aggregation at multiple zooms.

    The standard spatial rollup behind every map dashboard and geo-tiled
    dataset layout: project each point to its z/x/y tile at zooms
    ``TILE_ZOOMS`` and aggregate per tile. The mercator y uses the exact
    OSM formula ``(1 - ln(tan(lat) + sec(lat))/pi) / 2 * 2^z`` with the
    projection's +/-85.05° latitude clamp; because ln/tan/cos are not
    correctly-rounded IEEE ops, the value is quantized to 1e-9 before
    floor in BOTH engines so an ulp-level libm divergence at a tile
    boundary cannot flip the tile (ADVICE r13). The
    integer checksum pins membership — one point in a wrong tile fails
    the driver hash even if counts collide.

    Scale shape: the zoom fan-out is a bounded in-row explode (x3), tile
    assignment is a projection, and the aggregate is map-side-combinable
    on naturally well-spread keys (tiles). At 100 TB this is exactly the
    pre-aggregation layer a tile server reads; finer zooms only widen
    the key space, never the shuffle width per key.
    """
    k = F.col("c_custkey")
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((k % 360) - 180 + ((k * 7919) % 1000) / 1000.0).alias("x"),
        (((k * 31) % 180) - 90 + ((k * 104729) % 1000) / 1000.0).alias("y"),
    )
    zoomed = pts.select(
        "c_custkey",
        "x",
        F.least(
            F.greatest(F.col("y"), F.lit(-TILE_MAX_LAT)), F.lit(TILE_MAX_LAT)
        ).alias("yc"),
        F.explode(F.array(*[F.lit(z) for z in TILE_ZOOMS])).alias("zoom"),
    )
    # pow(2, z) is exact in doubles for these exponents, matching the
    # oracle's integer (1 << zoom) after implicit double promotion.
    n_tiles = F.pow(F.lit(2.0), F.col("zoom"))
    lat = F.radians(F.col("yc"))
    tile_x = F.floor((F.col("x") + 180.0) / 360.0 * n_tiles)
    # Quantize the mercator value to 1e-9 BEFORE floor, identically in
    # the oracle: Java Math and DuckDB libm are not bit-identical for
    # transcendentals (only +,-,*,/ are correctly rounded IEEE), so a
    # point within an ulp of a tile boundary could otherwise floor to
    # different tiles in the two engines (ADVICE r13). 1e-9 of a tile is
    # ~40 µm of ground truth at zoom 6 — far below any data precision.
    tile_y = F.floor(
        F.round(
            (
                1.0
                - F.log(F.tan(lat) + 1.0 / F.cos(lat))
                / F.lit(3.141592653589793)
            )
            / 2.0
            * n_tiles,
            9,
        )
    )
    return (
        zoomed.select(
            "c_custkey",
            F.col("zoom").cast("bigint").alias("zoom"),
            tile_x.cast("bigint").alias("tile_x"),
            tile_y.cast("bigint").alias("tile_y"),
        )
        .groupBy("zoom", "tile_x", "tile_y")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("c_custkey").alias("custkey_checksum"),
        )
    )
