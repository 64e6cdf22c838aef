"""Interleaved same-session A/B of knn_ivf_pq plan-structure variants.

VERDICT r16 #1: the zero-norm-gated ``staged_vectors`` subtree is
re-derived ~16x in knn_ivf_pq's final plan (every consumer inlines the
scan+gate+quantize chain), and the measured ~1.2x regression vs r15 is
driver-side plan/codegen overhead, not executor work (exchange reuse
already dedupes execution). Candidate fix: eagerly truncate the TINY
constant-size frames (coarse codebook: IVF_N_CELLS=8 rows; residual
codebook: PQ_M*PQ_K=1024 rows) with localCheckpoint so the big tree
references leaves instead of re-deriving the corpus chain.

Variants are interleaved A,B,C,A,B,C,... within ONE session so every
variant sees the same host drift (SCALE.md §0 discipline).

Usage: python scripts/opt_ab_ivfpq.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def variant_inrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_ivf_pq with in-row argmin folds over broadcast codebook arrays.

    The coarse assignment and the PQ encode are argmins against SMALL
    broadcast codebooks (8 cells, 64 residual centroids per subspace).
    HEAD materializes them as crossJoin/join row streams (2000x8 and
    2000x16x64 rows) fed into packed-long min aggregates — two groupBy
    exchanges plus a corpus join-back to recover qv. Here each codebook
    is collapsed to ONE array column (collect_list of structs) and the
    argmin is an in-row ``aggregate`` fold with the SAME packed-long
    lexicographic min (fold order immaterial: least() is commutative/
    associative over exact integers), so assignment+residual+encode is
    one narrow map pass: no candidate row stream, no groupBy exchange,
    no join-back. The probe top-IVF_NPROBE similarly becomes an in-row
    sort_array+slice over the 8-cell array (row_number over (d2,
    cell_id) == lexicographic sort on the same key, unique since
    cell_id is unique). All arithmetic unchanged, exact integers.
    """
    from data_preparation_plugin_spark.plans.similarity import (
        IVF_N_CELLS,
        IVF_NPROBE,
        IVFPQ_RERANK,
        N_QUERY_VECS,
        PQ_K,
        PQ_M,
        PQ_QSCALE,
        PQ_SUBDIM,
        TOP_K,
        staged_vectors,
    )

    normed = staged_vectors(spark, sf_dir)
    qv = F.transform(
        F.col("v"),
        lambda e: F.floor(e / F.col("nrm") * PQ_QSCALE).cast("bigint"),
    )
    vecs = normed.select("vec_id", qv.alias("qv"))
    coarse = vecs.where(F.col("vec_id") < IVF_N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("qv").alias("cqv")
    )
    # The whole coarse codebook as ONE row: array of (cell_id, cqv).
    coarse_arr = coarse.groupBy().agg(
        F.collect_list(F.struct("cell_id", "cqv")).alias("cells")
    )

    def _full_d2_c(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    big = F.lit((1 << 62)).cast("long")
    # packed argmin over the in-row cell array: min(d2 * N_CELLS + cell_id)
    best_cell_ck = lambda qcol: F.aggregate(  # noqa: E731
        F.col("cells"),
        big,
        lambda acc, c: F.least(
            acc,
            _full_d2_c(qcol, c["cqv"]) * IVF_N_CELLS
            + c["cell_id"].cast("long"),
        ),
    )
    assigned = (
        vecs.crossJoin(F.broadcast(coarse_arr))
        .withColumn("cell", F.pmod(best_cell_ck(F.col("qv")), F.lit(IVF_N_CELLS)))
        .withColumn(
            "cqv",
            F.element_at(
                F.filter("cells", lambda c: c["cell_id"] == F.col("cell")), 1
            )["cqv"],
        )
        .select(
            "vec_id",
            "cell",
            F.zip_with("qv", "cqv", lambda x, y: x - y).alias("rv"),
        )
    )
    subs = assigned.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.slice("rv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for m in range(PQ_M)
                ]
            )
        ).alias("m", "sv"),
    )
    rcents = subs.where(F.col("vec_id") < PQ_K).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("cent_id"),
        F.col("sv").alias("cv"),
    )
    # Per-subspace codebook as ONE array column (16 rows of 64 structs).
    rcents_bym = rcents.groupBy("cm").agg(
        F.collect_list(F.struct("cent_id", "cv")).alias("cents")
    )

    def _sub_d2_c(a, b) -> Column:
        expr: Column | None = None
        for j in range(1, PQ_SUBDIM + 1):
            diff = F.element_at(a, j) - F.element_at(b, j)
            sq = diff * diff
            expr = sq if expr is None else expr + sq
        return expr

    encoded = (
        subs.join(F.broadcast(rcents_bym), F.col("m") == F.col("cm"))
        .select(
            "vec_id",
            "cell",
            "m",
            F.pmod(
                F.aggregate(
                    F.col("cents"),
                    big,
                    lambda acc, c: F.least(
                        acc,
                        _sub_d2_c(F.col("sv"), c["cv"]) * PQ_K
                        + c["cent_id"].cast("long"),
                    ),
                ),
                F.lit(PQ_K),
            ).alias("code"),
        )
    )
    # Probe: in-row top-IVF_NPROBE cells by (d2, cell_id) — sort the
    # annotated cell array and slice (struct sort is lexicographic and
    # (d2, cell_id) is unique, so order matches row_number exactly).
    probed = (
        vecs.where(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv"))
        .crossJoin(F.broadcast(coarse_arr))
        .select(
            "query_id",
            F.explode(
                F.slice(
                    F.sort_array(
                        F.transform(
                            "cells",
                            lambda c: F.struct(
                                _full_d2_c(F.col("qqv"), c["cqv"]).alias(
                                    "d2"
                                ),
                                c["cell_id"].alias("cell_id"),
                                F.zip_with(
                                    "qqv", c["cqv"], lambda x, y: x - y
                                ).alias("qrv"),
                            ),
                        )
                    ),
                    1,
                    IVF_NPROBE,
                )
            ).alias("pr"),
        )
        .select(
            "query_id",
            F.col("pr.cell_id").alias("pcell"),
            F.col("pr.qrv").alias("qrv"),
        )
    )
    dtab = (
        probed.select(
            "query_id",
            "pcell",
            F.posexplode(
                F.array(
                    *[
                        F.slice("qrv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                        for m in range(PQ_M)
                    ]
                )
            ).alias("qm", "qsv"),
        )
        .join(F.broadcast(rcents), F.col("qm") == F.col("cm"))
        .select(
            "query_id",
            "pcell",
            "qm",
            "cent_id",
            _sub_d2_c(F.col("qsv"), F.col("cv")).alias("qd2"),
        )
    )
    scored = (
        encoded.join(
            F.broadcast(dtab),
            (F.col("cell") == F.col("pcell"))
            & (F.col("m") == F.col("qm"))
            & (F.col("code") == F.col("cent_id")),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2").alias("adc"))
    )
    short_win = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    shortlist = (
        scored.withColumn("arn", F.row_number().over(short_win))
        .filter(F.col("arn") <= IVFPQ_RERANK)
        .select("query_id", "vec_id")
    )

    def _int_dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qside = vecs.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    reranked = (
        shortlist.join(F.broadcast(qside), "query_id")
        .join(vecs, "vec_id")
        .select(
            "query_id", "vec_id", _int_dot(F.col("q_qv"), F.col("qv")).alias("dot")
        )
    )
    topk_win = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), "vec_id"
    )
    return (
        reranked.withColumn("rn", F.row_number().over(topk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("dot").alias("int_dot"),
            "rn",
        )
    )


def variant_restructure(
    spark: SparkSession, sf_dir: str, ckpt: bool = False
) -> DataFrame:
    """knn_ivf_pq with the assignment join-back removed.

    HEAD computes ``assigned`` as crossJoin+groupBy(vec_id) and then
    JOINS it back to ``vecs`` to recover qv — a corpus-vs-corpus
    shuffle join whose only purpose is carrying qv around the
    aggregate. Grouping by (vec_id, qv) instead carries qv THROUGH the
    aggregate (qv is functionally determined by vec_id — each corpus
    row contributes exactly IVF_N_CELLS crossJoin rows all sharing the
    same qv — so the groups are identical and min(ck) is unchanged).
    Removes one staged_vectors subtree AND the join's two exchanges.
    """
    from data_preparation_plugin_spark.plans.similarity import (
        IVF_N_CELLS,
        IVF_NPROBE,
        IVFPQ_RERANK,
        N_QUERY_VECS,
        PQ_K,
        PQ_M,
        PQ_QSCALE,
        PQ_SUBDIM,
        TOP_K,
        staged_vectors,
    )

    normed = staged_vectors(spark, sf_dir)
    qv = F.transform(
        F.col("v"),
        lambda e: F.floor(e / F.col("nrm") * PQ_QSCALE).cast("bigint"),
    )
    vecs = normed.select("vec_id", qv.alias("qv"))
    coarse = vecs.where(F.col("vec_id") < IVF_N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("qv").alias("cqv")
    )
    if ckpt:
        coarse = coarse.localCheckpoint(eager=True)

    def _full_d2(a: str, b: str) -> Column:
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    resid = (
        vecs.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "qv",
            (_full_d2("qv", "cqv") * IVF_N_CELLS + F.col("cell_id")).alias(
                "ck"
            ),
        )
        .groupBy("vec_id", "qv")
        .agg(F.min("ck").alias("best"))
        .select(
            "vec_id",
            "qv",
            F.pmod("best", F.lit(IVF_N_CELLS)).cast("bigint").alias("cell"),
        )
        .join(F.broadcast(coarse), F.col("cell") == F.col("cell_id"))
        .select(
            "vec_id",
            "cell",
            F.zip_with("qv", "cqv", lambda x, y: x - y).alias("rv"),
        )
    )
    subs = resid.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.slice("rv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for m in range(PQ_M)
                ]
            )
        ).alias("m", "sv"),
    )
    rcents = subs.where(F.col("vec_id") < PQ_K).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("cent_id"),
        F.col("sv").alias("cv"),
    )
    if ckpt:
        rcents = rcents.localCheckpoint(eager=True)

    def _sub_d2(a: str, b: str) -> Column:
        expr: Column | None = None
        for j in range(1, PQ_SUBDIM + 1):
            diff = F.element_at(a, j) - F.element_at(b, j)
            sq = diff * diff
            expr = sq if expr is None else expr + sq
        return expr

    encoded = (
        subs.join(F.broadcast(rcents), F.col("m") == F.col("cm"))
        .select(
            "vec_id",
            "cell",
            "m",
            (_sub_d2("sv", "cv") * PQ_K + F.col("cent_id")).alias("ck"),
        )
        .groupBy("vec_id", "cell", "m")
        .agg(F.min("ck").alias("best"))
        .select(
            "vec_id",
            "cell",
            "m",
            F.pmod("best", F.lit(PQ_K)).cast("bigint").alias("code"),
        )
    )
    probe_win = Window.partitionBy("query_id").orderBy("d2", "cell_id")
    probed = (
        vecs.where(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv"))
        .crossJoin(F.broadcast(coarse))
        .select(
            "query_id",
            "qqv",
            "cell_id",
            "cqv",
            _full_d2("qqv", "cqv").alias("d2"),
        )
        .withColumn("rn", F.row_number().over(probe_win))
        .where(F.col("rn") <= IVF_NPROBE)
        .select(
            "query_id",
            F.col("cell_id").alias("pcell"),
            F.zip_with("qqv", "cqv", lambda x, y: x - y).alias("qrv"),
        )
    )
    dtab = (
        probed.select(
            "query_id",
            "pcell",
            F.posexplode(
                F.array(
                    *[
                        F.slice("qrv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                        for m in range(PQ_M)
                    ]
                )
            ).alias("qm", "qsv"),
        )
        .join(F.broadcast(rcents), F.col("qm") == F.col("cm"))
        .select(
            "query_id",
            "pcell",
            "qm",
            "cent_id",
            _sub_d2("qsv", "cv").alias("qd2"),
        )
    )
    scored = (
        encoded.join(
            F.broadcast(dtab),
            (F.col("cell") == F.col("pcell"))
            & (F.col("m") == F.col("qm"))
            & (F.col("code") == F.col("cent_id")),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2").alias("adc"))
    )
    short_win = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    shortlist = (
        scored.withColumn("arn", F.row_number().over(short_win))
        .filter(F.col("arn") <= IVFPQ_RERANK)
        .select("query_id", "vec_id")
    )

    def _int_dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qside = vecs.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    reranked = (
        shortlist.join(F.broadcast(qside), "query_id")
        .join(vecs, "vec_id")
        .select(
            "query_id", "vec_id", _int_dot(F.col("q_qv"), F.col("qv")).alias("dot")
        )
    )
    topk_win = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), "vec_id"
    )
    return (
        reranked.withColumn("rn", F.row_number().over(topk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("dot").alias("int_dot"),
            "rn",
        )
    )


def variant_ckpt(spark: SparkSession, sf_dir: str, ckpt_dtab: bool = False) -> DataFrame:
    """knn_ivf_pq with coarse/rcents (and optionally dtab) checkpointed."""
    from data_preparation_plugin_spark.plans.similarity import (
        IVF_N_CELLS,
        IVF_NPROBE,
        IVFPQ_RERANK,
        N_QUERY_VECS,
        PQ_K,
        PQ_M,
        PQ_QSCALE,
        PQ_SUBDIM,
        TOP_K,
        staged_vectors,
    )

    normed = staged_vectors(spark, sf_dir)
    qv = F.transform(
        F.col("v"),
        lambda e: F.floor(e / F.col("nrm") * PQ_QSCALE).cast("bigint"),
    )
    vecs = normed.select("vec_id", qv.alias("qv"))
    coarse = (
        vecs.where(F.col("vec_id") < IVF_N_CELLS)
        .select(F.col("vec_id").alias("cell_id"), F.col("qv").alias("cqv"))
        .localCheckpoint(eager=True)
    )

    def _full_d2(a: str, b: str) -> Column:
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    assigned = (
        vecs.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "qv",
            (_full_d2("qv", "cqv") * IVF_N_CELLS + F.col("cell_id")).alias(
                "ck"
            ),
        )
        .groupBy("vec_id")
        .agg(F.min("ck").alias("best"))
        .select(
            "vec_id",
            F.pmod("best", F.lit(IVF_N_CELLS)).cast("bigint").alias("cell"),
        )
    )
    resid = (
        vecs.join(assigned, "vec_id")
        .join(F.broadcast(coarse), F.col("cell") == F.col("cell_id"))
        .select(
            "vec_id",
            "cell",
            F.zip_with("qv", "cqv", lambda x, y: x - y).alias("rv"),
        )
    )
    subs = resid.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.slice("rv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for m in range(PQ_M)
                ]
            )
        ).alias("m", "sv"),
    )
    rcents = (
        subs.where(F.col("vec_id") < PQ_K)
        .select(
            F.col("m").alias("cm"),
            F.col("vec_id").alias("cent_id"),
            F.col("sv").alias("cv"),
        )
        .localCheckpoint(eager=True)
    )

    def _sub_d2(a: str, b: str) -> Column:
        expr: Column | None = None
        for j in range(1, PQ_SUBDIM + 1):
            diff = F.element_at(a, j) - F.element_at(b, j)
            sq = diff * diff
            expr = sq if expr is None else expr + sq
        return expr

    encoded = (
        subs.join(F.broadcast(rcents), F.col("m") == F.col("cm"))
        .select(
            "vec_id",
            "cell",
            "m",
            (_sub_d2("sv", "cv") * PQ_K + F.col("cent_id")).alias("ck"),
        )
        .groupBy("vec_id", "cell", "m")
        .agg(F.min("ck").alias("best"))
        .select(
            "vec_id",
            "cell",
            "m",
            F.pmod("best", F.lit(PQ_K)).cast("bigint").alias("code"),
        )
    )
    probe_win = Window.partitionBy("query_id").orderBy("d2", "cell_id")
    probed = (
        vecs.where(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv"))
        .crossJoin(F.broadcast(coarse))
        .select(
            "query_id",
            "qqv",
            "cell_id",
            "cqv",
            _full_d2("qqv", "cqv").alias("d2"),
        )
        .withColumn("rn", F.row_number().over(probe_win))
        .where(F.col("rn") <= IVF_NPROBE)
        .select(
            "query_id",
            F.col("cell_id").alias("pcell"),
            F.zip_with("qqv", "cqv", lambda x, y: x - y).alias("qrv"),
        )
    )
    dtab = (
        probed.select(
            "query_id",
            "pcell",
            F.posexplode(
                F.array(
                    *[
                        F.slice("qrv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                        for m in range(PQ_M)
                    ]
                )
            ).alias("qm", "qsv"),
        )
        .join(F.broadcast(rcents), F.col("qm") == F.col("cm"))
        .select(
            "query_id",
            "pcell",
            "qm",
            "cent_id",
            _sub_d2("qsv", "cv").alias("qd2"),
        )
    )
    if ckpt_dtab:
        dtab = dtab.localCheckpoint(eager=True)
    scored = (
        encoded.join(
            F.broadcast(dtab),
            (F.col("cell") == F.col("pcell"))
            & (F.col("m") == F.col("qm"))
            & (F.col("code") == F.col("cent_id")),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2").alias("adc"))
    )
    short_win = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    shortlist = (
        scored.withColumn("arn", F.row_number().over(short_win))
        .filter(F.col("arn") <= IVFPQ_RERANK)
        .select("query_id", "vec_id")
    )

    def _int_dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qside = vecs.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    reranked = (
        shortlist.join(F.broadcast(qside), "query_id")
        .join(vecs, "vec_id")
        .select(
            "query_id", "vec_id", _int_dot(F.col("q_qv"), F.col("qv")).alias("dot")
        )
    )
    topk_win = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), "vec_id"
    )
    return (
        reranked.withColumn("rn", F.row_number().over(topk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("dot").alias("int_dot"),
            "rn",
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from data_preparation_plugin_spark import get_spark, plans

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    head = plans.QUERIES["knn_ivf_pq"].builder
    variants = {
        "head": lambda s, d: head(s, d),
        "restruct": lambda s, d: variant_restructure(s, d, ckpt=False),
        "restruct+ckpt": lambda s, d: variant_restructure(s, d, ckpt=True),
        "ckpt": lambda s, d: variant_ckpt(s, d, ckpt_dtab=False),
    }

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for b in variants.values():
        run(b(spark, "/root/testdata/sf0.001"))  # warm all variants

    t: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.reps):
        for label, b in variants.items():
            t0 = time.perf_counter()
            run(b(spark, sf_dir))
            t[label].append(time.perf_counter() - t0)
    for label, xs in t.items():
        print(
            f"{label}: min={min(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
