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
    grid_blocked_join,
    planar_distance_sq,
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
