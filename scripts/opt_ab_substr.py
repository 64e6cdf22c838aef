"""Interleaved A/B: dedup_substr_doubling re-digest ladder (pre-r17) vs
the rank-doubling pair ladder (r17).

variant_old is the r16 shape verbatim: every level re-digests
md5(substr(s, p, lvl)) from the raw text, which needs a join back to
the corpus per level. The registered builder (r17) digests the text
once at level 0 and keys every upper level on xxhash64 of the previous
level's digest pair (Manber-Myers doubling). Both are windowed,
checkpointed and early-stopped identically.

Usage: python scripts/opt_ab_substr.py [--reps 3] [--sf DIR]
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


def variant_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from data_preparation_plugin_spark.plans.dedup import (
        SUBSTR_BASE_LEN,
        SUBSTR_LEVELS,
    )
    from data_preparation_plugin_spark.plans.registry import (
        load_table,
        parallelize_scan,
    )

    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.lower(F.col("text")).alias("s"),
        F.length(F.lower(F.col("text"))).alias("n"),
    )
    cand = base.withColumn(
        "ps",
        F.expr(
            f"CASE WHEN n >= {SUBSTR_BASE_LEN}"
            f" THEN sequence(1, n - {SUBSTR_BASE_LEN} + 1)"
            " ELSE array() END"
        ),
    )
    per_level = []
    for lvl in SUBSTR_LEVELS:
        cand = cand.withColumn(
            "ps", F.expr(f"filter(ps, p -> p + {lvl} <= n + 1)")
        )
        exploded = cand.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(ps, p -> struct(p AS p,"
                    " CAST(conv(substr("
                    f"md5(substr(s, p, {lvl})), 1, 15), 16, 10)"
                    " AS BIGINT) AS dg))"
                )
            ).alias("x"),
        ).select("doc_id", "x.p", "x.dg")
        w_dg = Window.partitionBy("dg")
        surv = (
            exploded.withColumn("mn", F.min("doc_id").over(w_dg))
            .withColumn("mx", F.max("doc_id").over(w_dg))
            .where(F.col("mn") < F.col("mx"))
            .select("doc_id", "p")
            .localCheckpoint(eager=True)
        )
        per_level.append(
            surv.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_pos"))
            .withColumn("lvl", F.lit(lvl))
        )
        if surv.isEmpty():
            break
        cand = base.join(
            surv.groupBy("doc_id").agg(
                F.sort_array(F.collect_list("p")).alias("ps")
            ),
            "doc_id",
        )
    lv = per_level[0]
    for frame in per_level[1:]:
        lv = lv.unionByName(frame)
    return lv.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("lvl") == SUBSTR_BASE_LEN, F.col("n_pos")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_dup_grams"),
        F.max("lvl").cast("bigint").alias("max_dup_len"),
        F.max_by("n_pos", "lvl").cast("bigint").alias("n_pos_at_max"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from data_preparation_plugin_spark import get_spark, plans

    spark = get_spark(app_name="ab-substr")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "new": plans.QUERIES["dedup_substr_doubling"].builder,
        "old": variant_old,
    }

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
