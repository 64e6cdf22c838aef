"""Geometry predicates and spatial-join building blocks.

The reference loads shapefiles into PostGIS and lets users run spatial SQL
against the loaded tables (reference ``operators/shp2pgsql.py:13-27``);
``operators/shapefile.py`` here covers the *ingest* half (``.shp``/.dbf →
WKT columns). This module covers the *query* half for the predicates that
cover most pipeline uses — bounding-box containment, planar and haversine
distance — expressed as JVM column expressions so they stay inside
whole-stage codegen.

The 100 TB spatial-join pattern is grid blocking: map every point to a
fixed-size grid cell (``grid_cell``), explode every region into the bounded
set of cells its bbox covers (``covering_cells``), equi-join on the cell
key, then apply the exact predicate. The join is a plain hash join on an
integer key — broadcastable when the region side is dimension-sized,
shuffle-partitioned (never cartesian) when it is not.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default grid size in degrees. 7° cells keep the per-region covering set
#: tiny for country-scale boxes while splitting the world into ~1300 cells
#: — enough key cardinality to spread a planetary point set evenly.
GRID_DEG = 7.0


def bbox_contains(
    min_x: Column, min_y: Column, max_x: Column, max_y: Column,
    x: Column, y: Column,
) -> Column:
    """True when point (x, y) lies inside the closed box."""
    return (x >= min_x) & (x <= max_x) & (y >= min_y) & (y <= max_y)


def planar_distance_sq(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Squared euclidean distance in coordinate units.

    Pure multiply/add — bit-exact across engines (unlike transcendental
    haversine), so oracle comparisons can hash it directly. Sufficient for
    nearest-candidate ranking at city scale where curvature is negligible.
    """
    dx = x2 - x1
    dy = y2 - y1
    return dx * dx + dy * dy


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in kilometres (spherical earth, R=6371).

    Transcendental: engines may differ in the last ulp, so parity tests
    compare with tolerance rather than hashing (see tests/test_geo.py).
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(a))


def wkt_polygon_vertices(geom: Column) -> tuple[Column, Column]:
    """Parse a single-ring ``POLYGON ((x y, ...))`` WKT into vertex arrays.

    Returns ``(xs, ys)`` as ``array<double>`` columns over the closed ring
    (first vertex repeated last, the WKT convention). Pure JVM string ops
    — regexp + split + cast — so parsing stays inside codegen; no UDF.
    Spark's double→string→double cast round-trips exactly (shortest-repr
    serialization), so vertices written by :func:`polygon_wkt` survive the
    text round trip bit-for-bit.
    """
    inner = F.regexp_extract(geom, r"POLYGON \(\((.*)\)\)", 1)
    pairs = F.split(inner, ", ")
    xs = F.transform(
        pairs, lambda p: F.split(p, " ").getItem(0).cast("double")
    )
    ys = F.transform(
        pairs, lambda p: F.split(p, " ").getItem(1).cast("double")
    )
    return xs, ys


def polygon_wkt(xs: Column, ys: Column) -> Column:
    """Render closed-ring vertex arrays as single-ring POLYGON WKT."""
    pts = F.zip_with(
        xs,
        ys,
        lambda x, y: F.concat_ws(" ", x.cast("string"), y.cast("string")),
    )
    return F.concat(
        F.lit("POLYGON (("), F.array_join(pts, ", "), F.lit("))")
    )


def point_in_polygon(x: Column, y: Column, xs: Column, ys: Column) -> Column:
    """Ray-casting point-in-polygon over closed-ring vertex arrays.

    Casts a ray to +x and counts edge crossings; odd count = inside. The
    whole predicate is one higher-order ``filter`` over the edge indices —
    a JVM expression, no UDF, usable directly as a join/filter condition.
    Works for arbitrary simple polygons (convex or not); points exactly on
    an edge follow the usual half-open crossing convention. The DuckDB
    oracle mirrors the identical formula via ``list_filter``, so the two
    engines agree bit-for-bit on every IEEE comparison.
    """
    edges = F.sequence(F.lit(1), F.size(xs) - 1)

    def crosses(i: Column) -> Column:
        xi, yi = F.element_at(xs, i), F.element_at(ys, i)
        xj, yj = F.element_at(xs, i + 1), F.element_at(ys, i + 1)
        return ((yi > y) != (yj > y)) & (
            x < xi + (xj - xi) * (y - yi) / (yj - yi)
        )

    return F.size(F.filter(edges, crosses)) % 2 == 1


def _row_stride(cell_deg: float) -> int:
    """Columns-per-row stride for the linearised (row, col) cell key.

    Derived from ``cell_deg`` so distinct (row, col) pairs always map to
    distinct keys: longitudes span 360°, so any cell size yields at most
    ``ceil(360/cell_deg) + 1`` column indices (the +1 absorbs boundary
    floor effects for coordinates exactly at +180°). A fixed stride of
    1000 collided for cell_deg < ~0.36°, which duplicated join matches in
    ``grid_blocked_join``.
    """
    return int(math.ceil(360.0 / cell_deg)) + 2


def grid_cell(x: Column, y: Column, cell_deg: float = GRID_DEG) -> Column:
    """Integer grid-cell key for a point: the spatial-join blocking key."""
    stride = _row_stride(cell_deg)
    col = F.floor((x + 180.0) / cell_deg)
    row = F.floor((y + 90.0) / cell_deg)
    return (row * F.lit(stride) + col).cast("long")


def covering_cells(
    min_x: Column, min_y: Column, max_x: Column, max_y: Column,
    cell_deg: float = GRID_DEG,
) -> Column:
    """Array of grid-cell keys whose cells intersect the box.

    Bounded fan-out: a box spanning W×H degrees yields
    ceil(W/cell)×ceil(H/cell) keys. Regions explode through this before
    the equi-join; points carry a single ``grid_cell`` key.
    """
    stride = _row_stride(cell_deg)
    col_lo = F.floor((min_x + 180.0) / cell_deg).cast("long")
    col_hi = F.floor((max_x + 180.0) / cell_deg).cast("long")
    row_lo = F.floor((min_y + 90.0) / cell_deg).cast("long")
    row_hi = F.floor((max_y + 90.0) / cell_deg).cast("long")
    rows = F.sequence(row_lo, row_hi)
    cols = F.sequence(col_lo, col_hi)
    return F.flatten(
        F.transform(
            rows,
            lambda r: F.transform(cols, lambda c: r * F.lit(stride) + c),
        )
    )


def grid_blocked_join(
    points: DataFrame,
    regions: DataFrame,
    x: str = "x",
    y: str = "y",
    bbox: tuple[str, str, str, str] = ("min_x", "min_y", "max_x", "max_y"),
    cell_deg: float = GRID_DEG,
    broadcast_regions: bool = True,
    predicate: Column | None = None,
) -> DataFrame:
    """Point-in-region join via grid blocking: equi-join, never cartesian.

    Regions explode to their covering cells; points map to one cell; the
    hash join on the cell key prunes the candidate space to co-located
    pairs before the exact predicate runs (``bbox_contains`` by default;
    pass ``predicate`` for a finer shape test such as
    :func:`point_in_polygon` — the bbox columns must still bound the
    region so the covering-cell set stays lossless). With a
    dimension-sized region table the exploded side broadcasts (default);
    at planetary region counts pass ``broadcast_regions=False`` and both
    sides shuffle on the bounded-cardinality cell key.
    """
    mnx, mny, mxx, mxy = (F.col(c) for c in bbox)
    exploded = regions.withColumn(
        "__cell", F.explode(covering_cells(mnx, mny, mxx, mxy, cell_deg))
    )
    if broadcast_regions:
        exploded = F.broadcast(exploded)
    keyed = points.withColumn("__cell", grid_cell(F.col(x), F.col(y), cell_deg))
    exact = (
        predicate
        if predicate is not None
        else bbox_contains(mnx, mny, mxx, mxy, F.col(x), F.col(y))
    )
    joined = keyed.join(exploded, "__cell").filter(exact)
    return joined.drop("__cell")


__all__ = [
    "GRID_DEG",
    "bbox_contains",
    "covering_cells",
    "grid_blocked_join",
    "grid_cell",
    "haversine_km",
    "planar_distance_sq",
    "point_in_polygon",
    "polygon_wkt",
    "wkt_polygon_vertices",
]
