"""Interleaved A/B: graph_triangle_cooccurrence wedge-rows vs in-row
adjacency intersection.

HEAD (degree-oriented since r12) materializes the wedge stream as rows
— e1 join broadcast(e2) on the middle vertex — then closes each wedge
with a broadcast semi-join: every wedge pays a join probe plus a
semi-join hash lookup. VERDICT r16 #6 asks for a probe-stream cut; the
orientation it prescribes is already in place, so the remaining lever
is the join machinery itself: attach each oriented edge's OUT-ADJACENCY
arrays (collect_list over the checkpointed edge list, broadcast) and
count triangles per edge as ``array_intersect(adj(src), adj(dst))`` —
a triangle with ranked corners x<y<z is found exactly once, on its
lowest edge (x,y), because z is an out-neighbor of both x and y while
y is never an out-neighbor of z. No wedge rows, no semi-join; the
per-edge member contributions (src and dst weighted by the
intersection size, each common neighbor weighted 1) explode from ONE
pass so the intersection is computed once per edge.

Usage: python scripts/opt_ab_triangle.py [--reps 4] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def variant_wedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r17 shape: wedge rows + closing broadcast semi-join."""
    from data_preparation_plugin_spark.plans.registry import load_table

    parts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
    )
    pair_expr = F.expr(
        "flatten(transform(ps, x ->"
        " transform(filter(ps, y -> y > x),"
        " y -> struct(x AS u, y AS v))))"
    )
    edges = (
        parts.select(F.explode(pair_expr).alias("e"))
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = edges.join(
        F.broadcast(deg.selectExpr("node AS u", "deg AS du")), "u"
    ).join(F.broadcast(deg.selectExpr("node AS v", "deg AS dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    wedges = e1.join(F.broadcast(e2), F.col("b") == F.col("b2")).select(
        "a", "b", "c"
    )
    closing = oriented.select(
        F.col("src").alias("a3"), F.col("dst").alias("c3")
    )
    triangles = wedges.join(
        F.broadcast(closing),
        (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        "left_semi",
    )
    member = triangles.select(
        F.explode(F.array("a", "b", "c")).alias("part")
    )
    return member.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def variant_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_preparation_plugin_spark.plans.registry import load_table

    parts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
    )
    pair_expr = F.expr(
        "flatten(transform(ps, x ->"
        " transform(filter(ps, y -> y > x),"
        " y -> struct(x AS u, y AS v))))"
    )
    edges = (
        parts.select(F.explode(pair_expr).alias("e"))
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = edges.join(
        F.broadcast(deg.selectExpr("node AS u", "deg AS du")), "u"
    ).join(F.broadcast(deg.selectExpr("node AS v", "deg AS dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    tri = (
        oriented.join(
            F.broadcast(
                adj.select(F.col("src").alias("a_"), F.col("nbrs").alias("na"))
            ),
            F.col("src") == F.col("a_"),
        )
        .join(
            F.broadcast(
                adj.select(F.col("src").alias("b_"), F.col("nbrs").alias("nb"))
            ),
            F.col("dst") == F.col("b_"),
        )
        .select(
            "src",
            "dst",
            F.array_intersect("na", "nb").alias("cs"),
        )
    )
    contrib = tri.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("src").alias("part"),
                        F.size("cs").cast("long").alias("w"),
                    ),
                    F.struct(
                        F.col("dst").alias("part"),
                        F.size("cs").cast("long").alias("w"),
                    ),
                ),
                F.transform(
                    "cs",
                    lambda c: F.struct(
                        c.alias("part"), F.lit(1).cast("long").alias("w")
                    ),
                ),
            )
        ).alias("x")
    ).select("x.part", "x.w")
    return (
        contrib.groupBy("part")
        .agg(F.sum("w").alias("n_triangles"))
        .where(F.col("n_triangles") > 0)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from data_preparation_plugin_spark import get_spark, plans

    spark = get_spark(app_name="ab-triangle")
    spark.sparkContext.setLogLevel("ERROR")
    head = plans.QUERIES["graph_triangle_cooccurrence"].builder
    variants = {"head": head, "wedge": variant_wedge}

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for b in variants.values():
        run(b(spark, "/root/testdata/sf0.001"))
    t: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.reps):
        for label, b in variants.items():
            t0 = time.perf_counter()
            run(b(spark, args.sf))
            t[label].append(time.perf_counter() - t0)
    for label, xs in t.items():
        print(
            f"{label}: min={min(xs):.3f} all={[round(x, 3) for x in xs]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
