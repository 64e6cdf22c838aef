"""Geometry predicate tests: functions/geo.py and the grid-blocked join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_preparation_plugin_spark.functions.geo import (
    covering_cells,
    grid_blocked_join,
    grid_cell,
    haversine_km,
)


def test_haversine_known_distance(spark):
    """Paris→London ≈ 344 km (spherical model, ±2 km tolerance)."""
    df = spark.range(1).select(
        haversine_km(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("km")
    )
    km = df.collect()[0].km
    assert math.isclose(km, 343.9, abs_tol=2.0), km


def test_haversine_zero_and_antipodal(spark):
    rows = spark.range(1).select(
        haversine_km(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias("same"),
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(180.0)).alias("anti"),
    ).collect()[0]
    assert rows.same == 0.0
    assert math.isclose(rows.anti, math.pi * 6371.0, rel_tol=1e-9)


def test_covering_cells_bound_and_membership(spark):
    """A box's covering set is bounded by its ceil(span/cell) grid and
    contains the cell of every point inside the box."""
    box = spark.range(1).select(
        F.lit(-10.0).alias("min_x"), F.lit(-5.0).alias("min_y"),
        F.lit(10.0).alias("max_x"), F.lit(5.0).alias("max_y"),
    )
    cells = box.select(
        covering_cells(
            F.col("min_x"), F.col("min_y"), F.col("max_x"), F.col("max_y")
        ).alias("cells")
    ).collect()[0].cells
    # 20° x 10° box on a 7° grid: at most 4 x 3 cells.
    assert 1 <= len(cells) <= 12
    pts = spark.createDataFrame(
        [(-10.0, -5.0), (0.0, 0.0), (9.99, 4.99), (-9.99, 4.99)], "x double, y double"
    )
    pt_cells = {
        r.c for r in pts.select(grid_cell(F.col("x"), F.col("y")).alias("c")).collect()
    }
    assert pt_cells <= set(cells)


def test_grid_blocked_join_matches_naive(spark):
    """Blocking must be lossless: same result as the naive theta join."""
    pts = spark.range(500).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 37 % 360) - 180 + 0.5).cast("double").alias("x"),
        ((F.col("id") * 53 % 180) - 90 + 0.5).cast("double").alias("y"),
    )
    boxes = spark.range(20).select(
        F.col("id").alias("rid"),
        (F.col("id") * 18.0 - 180).alias("min_x"),
        (F.col("id") * 9.0 - 90).alias("min_y"),
        (F.col("id") * 18.0 - 180 + 17.0).alias("max_x"),
        (F.col("id") * 9.0 - 90 + 8.0).alias("max_y"),
    )
    blocked = {
        (r.pid, r.rid)
        for r in grid_blocked_join(pts, boxes).select("pid", "rid").collect()
    }
    naive = {
        (r.pid, r.rid)
        for r in pts.join(
            boxes,
            (F.col("x") >= F.col("min_x")) & (F.col("x") <= F.col("max_x"))
            & (F.col("y") >= F.col("min_y")) & (F.col("y") <= F.col("max_y")),
        ).select("pid", "rid").collect()
    }
    assert blocked == naive
    assert naive  # non-degenerate fixture


def test_grid_blocked_join_plan_shape(spark):
    """Equi-join on the cell key — broadcast hash join, no cartesian."""
    pts = spark.range(100).select(
        F.col("id").alias("pid"),
        (F.col("id") * 1.0 - 50).alias("x"),
        (F.col("id") * 0.5 - 25).alias("y"),
    )
    boxes = spark.range(5).select(
        F.col("id").alias("rid"),
        (F.col("id") * 30.0 - 75).alias("min_x"),
        (F.col("id") * 20.0 - 50).alias("min_y"),
        (F.col("id") * 30.0 - 46.0).alias("max_x"),
        (F.col("id") * 20.0 - 31.0).alias("max_y"),
    )
    plan = (
        grid_blocked_join(pts, boxes)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_point_in_polygon_matches_bbox_for_rectangles(spark):
    """For a rectangle ring, ray casting must agree with bbox containment
    on every non-boundary point — cross-validates the two predicates."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.functions.geo import (
        bbox_contains,
        point_in_polygon,
    )

    # Rectangle (2,1)-(8,5); probe grid offset by 0.5 to avoid edges.
    pts = spark.range(0, 121).select(
        ((F.col("id") % 11) + 0.5).alias("x"),
        ((F.col("id") / 11).cast("int") + 0.5).alias("y"),
    )
    xs = F.array(*[F.lit(v) for v in (2.0, 8.0, 8.0, 2.0, 2.0)])
    ys = F.array(*[F.lit(v) for v in (1.0, 1.0, 5.0, 5.0, 1.0)])
    checked = pts.select(
        point_in_polygon(F.col("x"), F.col("y"), xs, ys).alias("ray"),
        bbox_contains(
            F.lit(2.0), F.lit(1.0), F.lit(8.0), F.lit(5.0),
            F.col("x"), F.col("y"),
        ).alias("box"),
    )
    assert checked.filter(F.col("ray") != F.col("box")).count() == 0
    assert checked.filter(F.col("ray")).count() == 6 * 4


def test_wkt_polygon_roundtrip(spark):
    """polygon_wkt -> wkt_polygon_vertices is exact for arbitrary doubles."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.functions.geo import (
        polygon_wkt,
        wkt_polygon_vertices,
    )

    vals = [0.1, -179.999, 2.5e-7, 88.25, 0.1]
    xs = F.array(*[F.lit(v) for v in vals])
    ys = F.array(*[F.lit(v) for v in reversed(vals)])
    wkt = polygon_wkt(xs, ys)
    px, py = wkt_polygon_vertices(wkt)
    row = spark.range(1).select(
        (px == xs).alias("x_ok"), (py == ys).alias("y_ok")
    ).first()
    assert row.x_ok and row.y_ok
