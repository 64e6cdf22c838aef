"""Similarity-search capability queries over the ``embeddings`` table.

Driver mandate: approximate-nearest-neighbor over ``array<float>`` —
brute-force cosine top-k as the correctness baseline, an LSH-bucketed
variant as the 100 TB scale path. All vector math is ``zip_with`` /
``aggregate`` built-ins in double precision so the DuckDB oracle
(``list_cosine_similarity`` over ``DOUBLE[]``) reproduces values bit-close;
ranking rounds before ordering and tiebreaks on vec_id so top-k sets are
deterministic across engines.

The random-hyperplane LSH uses hyperplanes generated from a fixed seed and
inlined as literals into BOTH the Spark plan and the oracle SQL — the whole
approximate index is therefore hash-checkable, not just rows-counted.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_preparation_plugin_spark.functions.vector import (
    dot_product,
    l2_norm,
    lit_vector,
)
from data_preparation_plugin_spark.plans.registry import (
    NONZERO_VEC_SQL,
    load_table,
    nonzero_vec,
    parallelize_scan,
    register,
)

#: Query set: a fixed, small set of probe vectors.
N_QUERY_VECS = 10
TOP_K = 5
#: Random-hyperplane LSH: 8 planes -> 256 buckets over 64-dim embeddings.
N_HYPERPLANES = 8
EMBEDDING_DIM = 64
_SEED = 42

# Zero-norm exclusion contract: see registry.NONZERO_VEC_SQL (defined
# there so dedup.py shares the same literal without perturbing the
# registration order). Every cosine-family query below stages through
# nonzero_vec / {NONZERO_VEC_SQL}; hygiene queries keep zero rows.


def staged_vectors(
    spark: SparkSession, sf_dir: str, *extra: str
) -> DataFrame:
    """Embeddings staged for cosine scoring: ``vec_id`` (+ ``extra``
    columns), ``v`` (double), ``nrm`` — with zero-norm rows excluded.

    The L2 norm is computed ONCE per corpus row here, so the quadratic
    scoring stage pays only the dot product per pair —
    ``dot / (qnrm * nrm)`` — instead of re-folding both norms inside
    every pair (the ``dedup_embedding_cosine`` 3x-flops lesson, applied
    family-wide; at 100 TB the broadcast nested-loop scan is the hot
    loop and the norms are loop-invariant). The values are the
    identical IEEE doubles ``functions.vector.cosine_similarity``
    produces — same folds, same division structure, hoisted — so
    oracle parity is untouched. The zero-norm gate is the
    short-circuiting :func:`nonzero_vec` EXISTS predicate, not
    ``nrm > 0`` — a filter referencing the nrm fold gets the whole
    aggregate DUPLICATED into the Filter node under projection
    collapse (measured +33% on ``knn_lsh_cosine`` staging).

    The scan is fanned out first (``parallelize_scan``): every
    consumer's hot loop is per-row-heavy vector folds (dot products,
    norm folds, codebook scans), which a badly-split input file would
    otherwise serialize on one core (guide §2.5 input skew; the
    fixture parquet is a single row group = a single scan task).
    """
    return (
        parallelize_scan(load_table(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            *extra,
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn("nrm", l2_norm(F.col("v")))
        .filter(nonzero_vec("v"))
    )


def paired_cosine(
    qv: str = "qv", v: str = "v", qnrm: str = "qnrm", nrm: str = "nrm"
) -> Column:
    """``cosine_similarity`` with both norms precomputed (see
    :func:`staged_vectors`) — per pair, one dot-product fold only."""
    return dot_product(qv, v) / (F.col(qnrm) * F.col(nrm))


def _hyperplanes() -> np.ndarray:
    """Deterministic hyperplanes shared by the Spark plan and the oracle."""
    rng = np.random.RandomState(_SEED)
    return rng.randn(N_HYPERPLANES, EMBEDDING_DIM).round(6)


def _bucket_col(vec: Column) -> Column:
    """Sign-bit bucket id ('10110010'-style string) for a vector column."""
    bits = [
        F.when(dot_product(vec, lit_vector(plane)) >= 0, "1").otherwise("0")
        for plane in _hyperplanes()
    ]
    return F.concat(*bits)


def _bucket_sql(vec_expr: str) -> str:
    """The same bucket id as a DuckDB SQL expression."""
    bits = []
    for plane in _hyperplanes():
        arr = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {arr}) >= 0"
            f" THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


@register(
    "knn_bruteforce_cosine",
    category="similarity",
    bench=True,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}
    ), scored AS (
        SELECT query_id,
               e.vec_id AS neighbor_id,
               round(list_cosine_similarity(qv, e.v), 6) AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC,
                            e.vec_id) AS rn
        FROM q CROSS JOIN e
        WHERE e.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector (baseline).

    The probe set broadcasts (it is tiny by construction), so the "cross
    join" is really a broadcast nested loop streamed over the corpus —
    one pass, no shuffle of the big side; the per-query top-k is a
    bounded window.
    """
    emb = staged_vectors(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


def knn_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (the ANN index itself).

    Bucketing is a narrow map — each vector hashes independently, so index
    construction scales embarrassingly; the bucket histogram here is what
    an operator would monitor for skew. Library form only — unregistered:
    ``knn_lsh_cosine`` exercises the identical bucket expression end-to-end
    (bucket build + candidate join + top-k), so the histogram alone added
    no oracle coverage.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        emb.select("vec_id", _bucket_col(F.col("v")).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


@register(
    "knn_lsh_cosine",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_bucket_sql("embedding::DOUBLE[]")} AS bucket
        FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket FROM e
        WHERE vec_id < {N_QUERY_VECS}
    ), scored AS (
        SELECT query_id,
               e.vec_id AS neighbor_id,
               round(list_cosine_similarity(qv, e.v), 6) AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC,
                            e.vec_id) AS rn
        FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def knn_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The scale path: scoring touches only same-bucket candidates (expected
    corpus_size / 2^planes per query), turning an O(N) scan per query into
    an equi-join on the bucket key that shuffles each side once.

    Norm placement is the OPPOSITE of :func:`staged_vectors` here, on
    purpose: with candidates ~rows/2^planes per query, a corpus-wide
    staged norm column costs MORE folds than the candidate set ever
    evaluates (measured +50% vs this shape at sf0.1) — so the corpus
    side carries only the short-circuit zero gate, the 10-row query
    side stages qnrm, and the candidate norm folds once per surviving
    pair. Hoist norms when pairs >> rows (brute force, IVF); fold
    per-candidate when the index makes pairs << rows (LSH).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(nonzero_vec("v")).withColumn("bucket", _bucket_col(F.col("v")))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        l2_norm(F.col("v")).alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


#: IVF parameters: 8 coarse cells, probe the 2 nearest at query time.
IVF_N_CELLS = 8
IVF_NPROBE = 2


@register(
    "knn_ivf_cosine",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), cents AS (
        SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {IVF_N_CELLS}
    ), assigned AS (
        SELECT vec_id, v, cent_id AS cell FROM (
            SELECT e.vec_id, e.v, cents.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, cv), 6) DESC,
                                cent_id) AS crn
            FROM e CROSS JOIN cents
        ) WHERE crn = 1
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}
    ), probed AS (
        SELECT query_id, qv, cent_id AS cell FROM (
            SELECT q.query_id, q.qv, cents.cent_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                                cent_id) AS prn
            FROM q CROSS JOIN cents
        ) WHERE prn <= {IVF_NPROBE}
    ), scored AS (
        SELECT query_id,
               a.vec_id AS neighbor_id,
               round(list_cosine_similarity(qv, a.v), 6) AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, a.v), 6) DESC,
                            a.vec_id) AS rn
        FROM probed p JOIN assigned a ON p.cell = a.cell
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def knn_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flavored ANN: coarse-quantize into cells, probe the nearest 2.

    The inverted-file shape without the ML training loop: a deterministic
    coarse codebook (the first ``IVF_N_CELLS`` vectors stand in for k-means
    centroids — swap in persisted trained centroids in production), each
    corpus vector assigned to its nearest cell by one broadcast pass, and
    query-time scoring restricted to the ``IVF_NPROBE`` best cells. At
    100 TB the assignment is a narrow map over the corpus (codebook
    broadcast), the probe join keys on the cell id, and recall/cost tune
    via (n_cells, nprobe) exactly as in FAISS-style IVF indexes.
    """
    emb = staged_vectors(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < IVF_N_CELLS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    assign_win = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos", F.round(paired_cosine("v", "cv", "nrm", "cnrm"), 6)
        )
        .withColumn("crn", F.row_number().over(assign_win))
        .filter(F.col("crn") == 1)
        .select("vec_id", "v", "nrm", F.col("cent_id").alias("cell"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    probe_win = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("cent_id")
    )
    probed = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn(
            "pcos", F.round(paired_cosine("qv", "cv", "qnrm", "cnrm"), 6)
        )
        .withColumn("prn", F.row_number().over(probe_win))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", "qv", "qnrm", F.col("cent_id").alias("qcell"))
    )
    scored = (
        assigned.join(F.broadcast(probed), F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
    )
    topk_win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(topk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


@register(
    "embedding_norm_stats",
    category="similarity",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(sum(sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))), 2)
               / count(*) AS avg_norm,
           round(min(sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))), 4) AS min_norm,
           round(max(sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))), 4) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics (vector-column hygiene check)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    norm = l2_norm(F.col("v"))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (F.round(F.sum("norm"), 2) / F.count(F.lit(1))).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


@register(
    "knn_bruteforce_cosine_arrow",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}
    ), scored AS (
        SELECT query_id,
               e.vec_id AS neighbor_id,
               round(list_cosine_similarity(qv, e.v), 6) AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC,
                            e.vec_id) AS rn
        FROM q CROSS JOIN e
        WHERE e.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def knn_bruteforce_cosine_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized twin of ``knn_bruteforce_cosine`` (numpy batch math).

    The higher-order-function cosine is interpreted per element; this path
    moves each Arrow batch to numpy and scores the whole batch against the
    probe matrix with one BLAS matmul — the drop-in when profile shows the
    expression path bottlenecked. Shares the expression twin's oracle:
    BLAS summation order differs from the SQL left-fold only in final
    ulps, which the round-to-6dp scoring step absorbs before ranking
    (verified hash-identical at sf0.01 and sf0.1); the twin-equality test
    additionally pins both paths to each other.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(nonzero_vec("v"))
    probes = emb.filter(F.col("vec_id") < N_QUERY_VECS).collect()
    q_ids = np.array([r.vec_id for r in probes])
    q_mat = np.array([r.v for r in probes])  # (Q, D)
    q_norm = np.linalg.norm(q_mat, axis=1)
    # The probe matrix is tiny by construction (N_QUERY_VECS rows); it
    # ships to executors inside the UDF closure — the pandas analogue of
    # the broadcast in the expression twin.

    def score(batches):
        for pdf in batches:
            mat = np.array(pdf["v"].tolist())  # (B, D)
            norms = np.linalg.norm(mat, axis=1)
            cos = (mat @ q_mat.T) / np.outer(norms, q_norm)  # (B, Q)
            b, q = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], b, axis=0).ravel(),
                    "neighbor_id": np.repeat(
                        pdf["vec_id"].to_numpy()[:, None], q, axis=1
                    ).ravel(),
                    # Half-up (away from zero) like DuckDB round —
                    # np.round is banker's and would flip an exact 6dp
                    # halfway tie (sibling fix at :1580).
                    "cosine6": (
                        np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
                    ).ravel(),
                }
            )

    scored = emb.mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine6 double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


#: K-means assignment step: cluster count and quantization scale. The
#: embeddings are quantized to integers (floor(x*1000)) before any
#: cross-row aggregation, so centroid sums are exact integers and the
#: whole E/M step is bit-reproducible in any summation order — the
#: property cross-row float sums cannot give.
KMEANS_K = 8
KMEANS_QSCALE = 1000


@register(
    "knn_kmeans_step",
    category="similarity",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, vec_id % {KMEANS_K} AS seed,
               list_transform(embedding,
                   e -> CAST(floor(CAST(e AS DOUBLE) * {KMEANS_QSCALE}.0)
                             AS BIGINT)) AS qv
        FROM embeddings
    ), dims AS (
        SELECT seed, unnest(qv) AS val,
               unnest(range(1, len(qv) + 1)) AS pos
        FROM q
    ), cent AS (
        SELECT seed, pos, CAST(sum(val) AS DOUBLE) / count(*) AS c
        FROM dims GROUP BY seed, pos
    ), carr AS (
        SELECT seed, list(c ORDER BY pos) AS cv FROM cent GROUP BY seed
    ), pairs AS (
        SELECT q.vec_id, carr.seed,
               list_reduce(list_transform(range(1, len(q.qv) + 1),
                   i -> (q.qv[i] - carr.cv[i]) * (q.qv[i] - carr.cv[i])),
                   (acc, x) -> acc + x) AS dist2
        FROM q, carr
    ), best AS (
        SELECT vec_id, min(dist2) AS md FROM pairs GROUP BY vec_id
    ), assigned AS (
        SELECT p.vec_id, min(p.seed) AS centroid, min(b.md) AS dist2
        FROM pairs p JOIN best b
          ON p.vec_id = b.vec_id AND p.dist2 = b.md
        GROUP BY p.vec_id
    )
    SELECT centroid,
           count(*)    AS n_assigned,
           min(dist2)  AS min_dist2,
           max(dist2)  AS max_dist2
    FROM assigned
    GROUP BY centroid
    """,
)
def knn_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact k-means E/M step over quantized embeddings.

    The clustering primitive behind SemDeDup-style semantic dedup and
    diversity sampling: seed centroids as the elementwise mean of a
    deterministic partition (vec_id mod k), then reassign every vector to
    its nearest centroid. Quantizing to integers first makes the
    cross-row centroid sums exact (order-independent — the one thing
    distributed float summation can't guarantee), so the full step is
    hash-checkable against the oracle rather than tolerance-compared.

    Plan shape at 100 TB: the M step is a posexplode + two bounded-key
    aggregations (k×dim rows cross the wire, never vectors × dims
    unaggregated — partial aggregation runs map-side); the E step
    broadcasts the k centroid arrays and streams the corpus once with a
    left-fold distance (no cartesian: the join is a broadcast of k rows).
    Iterating the loop is this same job repeated — the standard Spark
    k-means shape (cf. MLlib's KMeans which adds distributed sampling
    for init).
    """
    k = KMEANS_K
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        (F.col("vec_id") % k).alias("seed"),
        F.transform(
            "embedding",
            lambda e: F.floor(e.cast("double") * KMEANS_QSCALE).cast("long"),
        ).alias("qv"),
    )
    dims = q.select("seed", F.posexplode("qv").alias("pos", "val"))
    # Sum in DECIMAL(38,0) — the headroom twin of DuckDB's HUGEINT sum
    # (LongType would ANSI-overflow past ~9 magnitude outliers per seed
    # class where the oracle keeps going); ONE exact-integer-to-double
    # conversion on each engine, then the identical IEEE division.
    cent = dims.groupBy("seed", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    carr = cent.groupBy("seed").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    ).withColumnRenamed("seed", "cand")
    pairs = q.drop("seed").join(F.broadcast(carr)).select(
        "vec_id",
        F.col("cand").alias("seed"),
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dist2"),
    )
    best = pairs.groupBy("vec_id").agg(F.min("dist2").alias("md"))
    assigned = (
        pairs.alias("p")
        .join(
            best.alias("b"),
            (F.col("p.vec_id") == F.col("b.vec_id"))
            & (F.col("p.dist2") == F.col("b.md")),
        )
        .groupBy("p.vec_id")
        .agg(F.min("p.seed").alias("centroid"), F.min("b.md").alias("dist2"))
    )
    return assigned.groupBy("centroid").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.min("dist2").alias("min_dist2"),
        F.max("dist2").alias("max_dist2"),
    )


@register(
    "embedding_standardize",
    category="similarity",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               unnest(embedding::DOUBLE[]) AS v,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ), st AS (
        SELECT dim,
               count(*)   AS n,
               sum(v)     AS s,
               sum(v * v) AS ss
        FROM e GROUP BY dim
        HAVING ss - s * s / count(*) > 0
    )
    SELECT e.vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           array_to_string(
               list(round((e.v - st.s / st.n)
                          / sqrt((st.ss - st.s * st.s / st.n) / (st.n - 1)),
                          4)::DECIMAL(12,4)
                    ORDER BY e.dim),
               ',') AS scaled
    FROM e JOIN st ON e.dim = st.dim
    GROUP BY e.vec_id
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature standardization over the embedding column.

    The classic ML feature-scaling pass ((x - μ)/σ per dimension),
    distributed the only way that scales: per-dimension moments are one
    map-side-combinable aggregate over the exploded (dim, value) stream
    — 64 rows out — broadcast back onto the stream, and each vector is
    rebuilt with an in-row sort, no window. Standard deviation is closed
    form from (n, Σ, Σx²) — the same IEEE-identical construction as
    ``events_anomaly_zscore`` — and the 4dp round absorbs
    summation-order ulps in the μ/σ estimates. Constant dimensions
    (zero variance) are dropped on both sides — 0/0 NaN semantics
    diverge between engines, and a zero-information feature has no
    standardized value anyway. ``scaled`` is emitted comma-joined (the
    driver harness hashes rows via pandas and cannot hash list cells).
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("dim", "v"))
        .select("vec_id", (F.col("dim") + 1).alias("dim"),
                F.col("v").cast("double").alias("v"))
    )
    stats = emb.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    ).filter(F.col("ss") - F.col("s") * F.col("s") / F.col("n") > 0)
    scaled = (F.col("v") - F.col("s") / F.col("n")) / F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return (
        emb.join(F.broadcast(stats), "dim")
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dims"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("dim").alias("dim"),
                                F.round(scaled, 4).alias("sv"),
                            )
                        )
                    ),
                    lambda x: x.getField("sv").cast("decimal(12,4)").cast(
                        "string"
                    ),
                ),
                ",",
            ).alias("scaled"),
        )
    )


@register(
    "knn_hard_negatives",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, label AS qlabel, v AS qv
        FROM e WHERE vec_id < {N_QUERY_VECS}
    ), scored AS (
        SELECT query_id,
               e.vec_id AS negative_id,
               CAST(e.label AS INTEGER) AS negative_label,
               round(list_cosine_similarity(qv, e.v), 6) AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC,
                            e.vec_id) AS rn
        FROM q CROSS JOIN e
        WHERE e.label <> q.qlabel
    )
    SELECT query_id, negative_id, negative_label,
           round(cosine, 4) AS cosine, rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def knn_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: nearest neighbors with a DIFFERENT label.

    The contrastive-training data op (embedding-model and reranker
    pipelines live on it): for each anchor, the most-similar vectors from
    *other* classes are exactly the negatives worth training on. Same
    broadcast-probe + one-corpus-pass shape as ``knn_bruteforce_cosine``
    — the label inequality just rides the join predicate — and the same
    round-before-rank discipline keeps ranks hash-stable. Scale path:
    swap the brute-force pass for the LSH/IVF candidate generation, keep
    the label filter and per-anchor top-k.
    """
    emb = staged_vectors(spark, sf_dir, "label")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("label") != F.col("qlabel"))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").cast("int").alias("negative_label"),
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


#: Product quantization: 64-dim vectors cut into PQ_M subspaces of
#: PQ_SUBDIM dims; each subvector coded against a PQ_K-entry codebook.
#: A coded vector stores PQ_M small ints instead of 64 floats — the
#: compression that makes billion-vector ANN RAM-resident.
PQ_M = 16
PQ_K = 64
PQ_SUBDIM = EMBEDDING_DIM // PQ_M
#: Quantization scale for unit-normalized components (|x| <= 1).
PQ_QSCALE = 100000

_PQ_SUBDIST = (
    "list_reduce(list_transform(range(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
)


@register(
    "knn_pq_adc",
    category="similarity",
    bench=True,
    oracle=f"""
    WITH raw AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id,
               list_transform(v,
                   e -> CAST(floor(e / sqrt(list_reduce(
                            list_prepend(0.0, list_transform(v, x -> x * x)),
                            (a, b) -> a + b)) * {PQ_QSCALE}.0)
                             AS BIGINT)) AS qv
        FROM raw
    ), subs AS (
        SELECT vec_id, m,
               qv[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
        FROM q, unnest(range(0, {PQ_M})) AS t(m)
    ), cents AS (
        SELECT m AS cm, vec_id AS cent_id, sv AS cv
        FROM subs WHERE vec_id < {PQ_K}
    ), enc AS (
        SELECT vec_id, m, cent_id AS code FROM (
            SELECT s.vec_id, s.m, c.cent_id,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_PQ_SUBDIST.format(n=PQ_SUBDIM + 1, a='s.sv', b='c.cv')},
                                c.cent_id) AS rn
            FROM subs s JOIN cents c ON s.m = c.cm)
        WHERE rn = 1
    ), dtab AS (
        SELECT s.vec_id AS query_id, s.m, c.cent_id,
               {_PQ_SUBDIST.format(n=PQ_SUBDIM + 1, a='s.sv', b='c.cv')} AS qd2
        FROM subs s JOIN cents c ON s.m = c.cm
        WHERE s.vec_id < {N_QUERY_VECS}
    ), scored AS (
        SELECT d.query_id, e.vec_id, CAST(sum(d.qd2) AS BIGINT) AS adc
        FROM enc e JOIN dtab d ON e.m = d.m AND e.code = d.cent_id
        WHERE e.vec_id <> d.query_id
        GROUP BY d.query_id, e.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, adc AS adc_dist2, rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc, vec_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) scoring.

    The Jegou et al. PQ index, relationally: vectors are integer-quantized
    (exact arithmetic, see ``knn_kmeans_step``'s rationale), cut into
    ``PQ_M`` subspaces, and each subvector is encoded as the id of its
    nearest codebook entry (codebook = the first ``PQ_K`` vectors'
    subvectors standing in for trained centroids — swap in persisted
    k-means output in production, the plan is identical). Query-time ADC:
    a per-query distance table (query subvector -> every codebook entry)
    is broadcast, and each candidate's approximate distance is the sum of
    ``PQ_M`` table lookups — no float math against corpus vectors at all.

    Scale shape: the codebook (PQ_M x PQ_K subvectors) broadcasts
    everywhere; encoding is one narrow pass over the corpus producing
    ``PQ_M`` small ints per vector (16 byte-wide codes vs 256 bytes of
    floats — the compression that fits the coded corpus in executor
    memory at scales where raw vectors cannot). The ADC distance table is queries x PQ_M x PQ_K rows
    — broadcast-sized for any bounded query batch — so scoring is a
    broadcast hash join on (subspace, code) plus an integer sum-groupBy:
    map-side combinable, shuffling only (query_id, vec_id, partial) rows.
    All distances are exact integers, so ranking is order-immune and
    engine-agnostic with no rounding step.
    """
    # Unit-normalize BEFORE quantizing: on unit vectors L2 order equals
    # cosine order (||a-b||^2 = 2 - 2cos), so ADC ranking approximates
    # the same metric the brute-force baseline uses. The norm is an
    # ordered left fold (0.0 + x1^2 + x2^2...) — bit-identical to the
    # oracle's list_reduce, so quantized codes match exactly.
    normed = staged_vectors(spark, sf_dir)
    qv = F.transform(
        F.col("v"),
        lambda e: F.floor(e / F.col("nrm") * PQ_QSCALE).cast("bigint"),
    )
    # NOT materialized: recomputing the quantize transform per consumer
    # is the cheapest option here, measured both ways (r16 idle-host
    # A/B, best-of-3 at sf0.1): persist() pays the array<long> columnar
    # cache build plus same-job cache races (1.3s -> 8.8s) and an
    # eager localCheckpoint pays its RDD materialization up front every
    # build (1.52s -> 4.29s). The re-run transform is one in-row fold
    # over already-staged vectors; all the consumers that matter
    # (codebook slice, distance tables) read only tiny slices of it.
    vecs = normed.select("vec_id", qv.alias("qv"))
    subs = vecs.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("qv", m * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for m in range(PQ_M)
                ]
            )
        ).alias("m", "sv"),
    )
    cents = subs.where(F.col("vec_id") < PQ_K).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("cent_id"),
        F.col("sv").alias("cv"),
    )

    def _sub_dist2(a: str, b: str) -> Column:
        # Unrolled (PQ_SUBDIM is tiny and fixed): pure codegen integer
        # arithmetic, ~6x faster than an interpreted zip_with/aggregate
        # HOF pair across the n x PQ_M x PQ_K candidate stream. Left-to-
        # right addition matches the oracle's list_reduce fold (moot
        # anyway: integers are order-exact).
        expr: Column | None = None
        for j in range(1, PQ_SUBDIM + 1):
            diff = F.element_at(a, j) - F.element_at(b, j)
            sq = diff * diff
            expr = sq if expr is None else expr + sq
        return expr

    # argmin per (vector, subspace) as a map-side-combinable min — a
    # row_number window here would shuffle and sort the full candidate
    # stream (n x PQ_M x PQ_K rows). The lexicographic (d2, cent_id)
    # pair is packed into ONE long (d2 * PQ_K + cent_id; exact since
    # cent_id < PQ_K and d2 <= PQ_SUBDIM * (2*PQ_QSCALE)^2 ~ 1.6e11, so
    # the product stays far under 2^63): min(struct) has an immutable
    # buffer and silently degrades the whole keyed aggregate to
    # Sort+SortAggregate over the candidate stream, while min(long)
    # keeps it a HashAggregate — r13 interleaved A/B on the encode
    # stage: 1.31s -> 0.87s at sf0.1, codes identical.
    encoded = (
        subs.join(F.broadcast(cents), F.col("m") == F.col("cm"))
        .select(
            "vec_id",
            "m",
            (_sub_dist2("sv", "cv") * PQ_K + F.col("cent_id")).alias("ck"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("ck").alias("best"))
        .select(
            "vec_id", "m", F.pmod("best", F.lit(PQ_K)).cast("bigint").alias("code")
        )
    )
    dtab = (
        subs.where(F.col("vec_id") < N_QUERY_VECS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("m").alias("qm"),
            F.col("sv").alias("qsv"),
        )
        .join(F.broadcast(cents), F.col("qm") == F.col("cm"))
        .select(
            "query_id", "qm", "cent_id", _sub_dist2("qsv", "cv").alias("qd2")
        )
    )
    scored = (
        encoded.join(
            F.broadcast(dtab),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("cent_id")),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2").alias("adc"))
    )
    topk_win = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(topk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("adc").cast("long").alias("adc_dist2"),
            "rn",
        )
    )


_IVFPQ_FULLDIST = _PQ_SUBDIST  # same fold, parameterized by n below

#: ADC shortlist size for the exact rerank stage: the index proposes
#: IVFPQ_RERANK candidates per query by compressed distance, then exact
#: integer dot products on just those rows pick the final TOP_K — the
#: standard recall-repair stage of a deployed IVFADC index.
IVFPQ_RERANK = 20

_INT_DOT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, {n}), i -> {a}[i] * {b}[i])), "
    "(acc, x) -> acc + x)"
)


@register(
    "knn_ivf_pq",
    scale_note="probed-cells-only candidate read on a ~2s denominator; candidates grow with corpus — ADC stays candidate-bound, never full-scan",
    category="similarity",
    bench=True,
    oracle=f"""
    WITH raw AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id,
               list_transform(v,
                   e -> CAST(floor(e / sqrt(list_reduce(
                            list_prepend(0.0, list_transform(v, x -> x * x)),
                            (a, b) -> a + b)) * {PQ_QSCALE}.0)
                             AS BIGINT)) AS qv
        FROM raw
    ), coarse AS (
        SELECT vec_id AS cell_id, qv AS cqv FROM q
        WHERE vec_id < {IVF_N_CELLS}
    ), assigned AS (
        SELECT vec_id, qv, cell_id AS cell, cqv FROM (
            SELECT q.vec_id, q.qv, coarse.cell_id, coarse.cqv,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_IVFPQ_FULLDIST.format(
                           n=EMBEDDING_DIM + 1, a='q.qv', b='coarse.cqv')},
                                cell_id) AS rn
            FROM q CROSS JOIN coarse
        ) WHERE rn = 1
    ), resid AS (
        SELECT vec_id, cell,
               list_transform(range(1, {EMBEDDING_DIM + 1}),
                              i -> qv[i] - cqv[i]) AS rv
        FROM assigned
    ), subs AS (
        SELECT vec_id, cell, m,
               rv[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
        FROM resid, unnest(range(0, {PQ_M})) AS t(m)
    ), rcents AS (
        SELECT m AS cm, vec_id AS cent_id, sv AS cv
        FROM subs WHERE vec_id < {PQ_K}
    ), enc AS (
        SELECT vec_id, cell, m, cent_id AS code FROM (
            SELECT s.vec_id, s.cell, s.m, c.cent_id,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_PQ_SUBDIST.format(
                           n=PQ_SUBDIM + 1, a='s.sv', b='c.cv')},
                                c.cent_id) AS rn
            FROM subs s JOIN rcents c ON s.m = c.cm)
        WHERE rn = 1
    ), probed AS (
        SELECT vec_id AS query_id, qv, cell_id AS pcell, cqv FROM (
            SELECT q.vec_id, q.qv, coarse.cell_id, coarse.cqv,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_IVFPQ_FULLDIST.format(
                           n=EMBEDDING_DIM + 1, a='q.qv', b='coarse.cqv')},
                                cell_id) AS rn
            FROM q CROSS JOIN coarse
            WHERE q.vec_id < {N_QUERY_VECS}
        ) WHERE rn <= {IVF_NPROBE}
    ), qresid AS (
        SELECT query_id, pcell,
               list_transform(range(1, {EMBEDDING_DIM + 1}),
                              i -> qv[i] - cqv[i]) AS qrv
        FROM probed
    ), dtab AS (
        SELECT s.query_id, s.pcell, s.m, c.cent_id,
               {_PQ_SUBDIST.format(n=PQ_SUBDIM + 1, a='s.qsv', b='c.cv')}
                   AS qd2
        FROM (SELECT query_id, pcell, m,
                     qrv[m * {PQ_SUBDIM} + 1
                         : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS qsv
              FROM qresid, unnest(range(0, {PQ_M})) AS t(m)) s
        JOIN rcents c ON s.m = c.cm
    ), scored AS (
        SELECT d.query_id, e.vec_id, CAST(sum(d.qd2) AS BIGINT) AS adc
        FROM enc e
        JOIN dtab d ON e.cell = d.pcell AND e.m = d.m AND e.code = d.cent_id
        WHERE e.vec_id <> d.query_id
        GROUP BY d.query_id, e.vec_id
    ), shortlist AS (
        SELECT query_id, vec_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc, vec_id) AS arn
            FROM scored)
        WHERE arn <= {IVFPQ_RERANK}
    ), reranked AS (
        SELECT s.query_id, s.vec_id,
               {_INT_DOT.format(n=EMBEDDING_DIM + 1,
                                a='qq.qv', b='cv.qv')} AS dot
        FROM shortlist s
        JOIN q qq ON qq.vec_id = s.query_id
        JOIN q cv ON cv.vec_id = s.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, dot AS int_dot, rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY dot DESC, vec_id) AS rn
          FROM reranked)
    WHERE rn <= {TOP_K}
    """,
)
def knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC): coarse cells + residual product quantization.

    The billion-scale ANN index composed from its two halves already in
    the registry: ``knn_ivf_cosine``'s inverted file restricts which
    candidates a query touches (``IVF_NPROBE`` of ``IVF_N_CELLS``
    cells), and ``knn_pq_adc``'s product quantizer compresses what is
    stored per candidate — but over the RESIDUAL (vector minus its
    cell centroid), the Jegou et al. IVFADC construction that makes the
    codebook spend its entropy on within-cell variation. All arithmetic
    is integer (quantized components, integer residuals, integer
    distance tables), so ranking is exact, order-immune, and
    engine-agnostic; both codebooks are the deterministic first-vectors
    stand-in for trained k-means output (swap persisted centroids in
    production — the plan is identical). A final EXACT rerank stage
    re-scores the ADC top-``IVFPQ_RERANK`` shortlist with full integer
    dot products — the standard recall repair of deployed IVFADC
    (measured here: 0.30 -> 0.58 recall@5 on the adversarially
    structureless random fixture).

    Scale shape: both codebooks broadcast (IVF: 8 full vectors; PQ:
    M x K subvectors). Assignment and encoding are one pass over the
    corpus emitting (vec_id, cell, M codes) — ~17 small ints per vector.
    Query-time: per-query-per-probed-cell residual distance tables
    broadcast (queries x nprobe x M x K rows, bounded by the query
    batch), and scoring joins them to the coded corpus on
    (cell, subspace, code) — the cell key means a candidate in an
    unprobed cell is never read, which is the entire IVF bargain; the
    rest is a map-side-combinable integer sum and a per-query top-k.
    No float math ever touches a corpus vector at query time.
    """
    normed = staged_vectors(spark, sf_dir)
    qv = F.transform(
        F.col("v"),
        lambda e: F.floor(e / F.col("nrm") * PQ_QSCALE).cast("bigint"),
    )
    # NOT materialized, same A/B as knn_pq_adc: persist() 8x worse,
    # eager localCheckpoint 2.79s -> 4.78s (r16 idle-host best-of-3).
    # The consumers re-run a cheap in-row fold; paying a full
    # materialization to save it loses on every variant measured.
    vecs = normed.select("vec_id", qv.alias("qv"))
    coarse = vecs.where(F.col("vec_id") < IVF_N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("qv").alias("cqv")
    )

    def _full_d2(a: str, b: str) -> Column:
        # Integer L2 over the full dimension via one fold — the
        # assignment stream is only n x IVF_N_CELLS rows, so the HOF
        # interpreter cost is marginal (unlike the n x M x K encode
        # stream, which uses the unrolled codegen form below).
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # Lexicographic (d2, cell_id) argmin packed into one long so the
    # keyed aggregate stays HashAggregate (min(struct)'s immutable
    # buffer forces Sort+SortAggregate; see the encode stage of
    # knn_pq_adc for the measured A/B). Exact: cell_id < IVF_N_CELLS
    # and full-dim d2 <= EMBEDDING_DIM * (2*PQ_QSCALE)^2 ~ 1e13.
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
    rcents = subs.where(F.col("vec_id") < PQ_K).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("cent_id"),
        F.col("sv").alias("cv"),
    )

    def _sub_d2(a: str, b: str) -> Column:
        expr: Column | None = None
        for j in range(1, PQ_SUBDIM + 1):
            diff = F.element_at(a, j) - F.element_at(b, j)
            sq = diff * diff
            expr = sq if expr is None else expr + sq
        return expr

    # Same packed-long argmin as the assignment above (and knn_pq_adc's
    # encode stage, where the r13 A/B measured 1.31s -> 0.87s): keeps
    # the n x PQ_M x PQ_K candidate stream's aggregate hash-based.
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
    # Exact rerank: the ADC index proposes IVFPQ_RERANK candidates per
    # query; only those few rows ever touch a full vector again. The
    # shortlist is (queries x R) keys — the exact-dot join reads a
    # vanishing fraction of the corpus, which is what makes rerank
    # essentially free next to the scan it replaces.
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


#: SemDeDup parameters. Clusters are adaptive-depth hyperplane blocks:
#: enough sign bits that blocks hold ~SEM_TARGET_BLOCK vectors each, so
#: cluster count grows WITH the corpus (the paper's k ~ n/constant) while
#: assignment stays a constant 12 dot products per vector. The
#: near-duplicate threshold is on the INTEGER dot product of quantized
#: unit vectors (~= cosine x PQ_QSCALE^2); 3e9 ~= cosine 0.30 (the p99 of
#: the fixture's pairwise-cosine distribution) keeps both keep and drop
#: paths exercised inside sign-agreeing blocks at every test scale.
SEM_TARGET_BLOCK = 64
SEM_MAX_BITS = 12
SEM_DUP_MINDOT = 3_000_000_000
_SEM_SEED = 4242


def _sem_planes() -> np.ndarray:
    rng = np.random.RandomState(_SEM_SEED)
    return rng.randn(SEM_MAX_BITS, EMBEDDING_DIM).round(6)


def _sem_sig_col(vec: Column) -> Column:
    bits = [
        F.when(dot_product(vec, lit_vector(p)) >= 0, "1").otherwise("0")
        for p in _sem_planes()
    ]
    return F.concat(*bits)


def _sem_sig_sql(vec_expr: str) -> str:
    bits = []
    for p in _sem_planes():
        arr = "[" + ", ".join(repr(float(v)) for v in p) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {arr}) >= 0"
            f" THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


def _sem_bits_case(n_expr: str) -> str:
    """Integer-exact adaptive depth: smallest b with 2^b blocks of ~target.

    A CASE chain over integer comparisons — no float log2, so both
    engines agree even at exact power-of-two boundaries.
    """
    clauses = [
        f"WHEN {n_expr} > {SEM_TARGET_BLOCK * 2 ** (b - 1)} THEN {b}"
        for b in range(SEM_MAX_BITS, 1, -1)
    ]
    return "CASE " + " ".join(clauses) + " ELSE 1 END"


@register(
    "dedup_semdedup_prune",
    category="dedup",
    oracle=f"""
    WITH raw AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id,
               list_transform(v,
                   e -> CAST(floor(e / sqrt(list_reduce(
                            list_prepend(0.0, list_transform(v, x -> x * x)),
                            (a, b) -> a + b)) * {PQ_QSCALE}.0)
                             AS BIGINT)) AS qv,
               {_sem_sig_sql('v')} AS sig
        FROM raw
    ), n AS (
        SELECT count(*) AS n_vecs FROM q
    ), blocked AS (
        SELECT vec_id, qv,
               substr(sig, 1, {_sem_bits_case('n.n_vecs')}) AS block
        FROM q CROSS JOIN n
    ), dims AS (
        SELECT vec_id, block, d, qv[d] AS x
        FROM blocked, unnest(range(1, {EMBEDDING_DIM + 1})) AS t(d)
    ), cent AS (
        SELECT block, d, CAST(sum(x) AS BIGINT) AS sx
        FROM dims GROUP BY block, d
    ), cdots AS (
        SELECT dims.vec_id, dims.block,
               CAST(sum(dims.x * cent.sx) AS BIGINT) AS cdot
        FROM dims JOIN cent ON dims.block = cent.block AND dims.d = cent.d
        GROUP BY dims.vec_id, dims.block
    ), side AS (
        SELECT b.vec_id, b.block, b.qv, c.cdot
        FROM blocked b JOIN cdots c ON b.vec_id = c.vec_id
    ), dropped AS (
        SELECT DISTINCT v.vec_id
        FROM side v JOIN side u
          ON v.block = u.block AND v.vec_id <> u.vec_id
        WHERE {_INT_DOT.format(n=EMBEDDING_DIM + 1,
                               a='v.qv', b='u.qv')} >= {SEM_DUP_MINDOT}
          AND (u.cdot < v.cdot
               OR (u.cdot = v.cdot AND u.vec_id < v.vec_id))
    )
    SELECT s.vec_id, s.block, s.cdot AS centroid_dot,
           CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS is_kept
    FROM side s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    """,
)
def dedup_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic near-duplicate pruning inside embedding clusters.

    Abbas et al. 2023's recipe for deduplicating web-scale corpora by
    MEANING rather than surface form: cluster the embeddings, and within
    each cluster drop every member that has a near-duplicate (cosine
    above threshold) CLOSER to the centroid — the paper keeps the
    low-centroid-similarity representative of each duplicate group to
    preserve diversity. Clustering here is an adaptive-depth
    random-hyperplane code: the number of sign bits grows with
    ``log2(corpus / SEM_TARGET_BLOCK)`` (an integer CASE, no float
    boundary hazards), so cluster count scales LINEARLY with the corpus
    and cluster size stays ~constant — the paper's k ~ n regime with a
    constant-cost assignment (12 dot products per vector, vs the n x k
    scan a literal k-means assignment would need). The centroid is the
    true cluster mean in integer form (element-wise sum), so the
    keep-farthest rule compares exact integers; near-dup checks compare
    integer dot products. Everything is engine-exact; ties break by
    vec_id.

    The round-6 x8 probe caught the previous form of this query (8
    FIXED clusters) at x13.4 — textbook quadratic blow-up from constant
    block count. This form probes linear. The price is LSH recall:
    near-dup pairs split across blocks are missed; production repairs
    that with banding (multiple independent codes, as
    ``dedup_minhash_lsh_pairs`` demonstrates) — the per-band plan is
    exactly this one.

    Scale shape: signature and quantization are narrow maps; the
    centroid is two map-side-combinable aggregates over the exploded
    (block, dim) stream; pair generation is an equi-join on the block id
    with ~SEM_TARGET_BLOCK rows per key; the drop check is a semi-join.
    Nothing global, nothing quadratic in the corpus.
    """
    normed = staged_vectors(spark, sf_dir)
    qv = F.transform(
        F.col("v"),
        lambda e: F.floor(e / F.col("nrm") * PQ_QSCALE).cast("bigint"),
    )
    vecs = normed.select(
        "vec_id", qv.alias("qv"), _sem_sig_col(F.col("v")).alias("sig")
    )
    n = vecs.agg(F.count(F.lit(1)).alias("n_vecs"))
    # blocked feeds the dim explode AND rides into `side`; side feeds
    # BOTH sides of the within-block pair join plus the final verdict
    # join. Without checkpoints each consumer re-runs the whole
    # embed -> quantize -> sign-code -> centroid pipeline (r12 A/B at
    # sf0.1: 3.86s -> 2.32s best-of-3 with these two materializations;
    # both are one row per vector — digest-sized, never the corpus).
    blocked = vecs.crossJoin(F.broadcast(n)).select(
        "vec_id",
        "qv",
        F.expr(f"substr(sig, 1, {_sem_bits_case('n_vecs')})").alias("block"),
    ).localCheckpoint(eager=True)
    dims = blocked.select(
        "vec_id", "block", F.posexplode("qv").alias("d0", "x")
    ).select("vec_id", "block", (F.col("d0") + 1).alias("d"), "x")
    cent = dims.groupBy("block", "d").agg(
        F.sum("x").cast("long").alias("sx")
    )
    cdots = (
        dims.join(cent, ["block", "d"])
        .groupBy("vec_id", "block")
        .agg(F.sum(F.col("x") * F.col("sx")).cast("long").alias("cdot"))
    )
    side = blocked.join(
        cdots.select("vec_id", "cdot"), "vec_id"
    ).localCheckpoint(eager=True)

    def _int_dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    u = side.select(
        F.col("vec_id").alias("u_id"),
        F.col("qv").alias("u_qv"),
        F.col("block").alias("u_block"),
        F.col("cdot").alias("u_cdot"),
    )
    dropped = (
        side.join(u, F.col("block") == F.col("u_block"))
        .where(F.col("vec_id") != F.col("u_id"))
        .where(_int_dot(F.col("qv"), F.col("u_qv")) >= SEM_DUP_MINDOT)
        .where(
            (F.col("u_cdot") < F.col("cdot"))
            | (
                (F.col("u_cdot") == F.col("cdot"))
                & (F.col("u_id") < F.col("vec_id"))
            )
        )
        .select("vec_id")
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return side.join(dropped, "vec_id", "left").select(
        "vec_id",
        "block",
        F.col("cdot").alias("centroid_dot"),
        F.when(F.col("__dropped").isNull(), 1).otherwise(0).alias("is_kept"),
    )


#: Cosine threshold for range (radius) search: ~6% of a random 64-d corpus
#: falls inside, so results are selective but never empty.
RADIUS_TAU = 0.2


@register(
    "knn_radius_search",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}
    )
    SELECT query_id,
           e.vec_id AS neighbor_id,
           round(round(list_cosine_similarity(qv, e.v), 6), 4) AS cosine
    FROM q CROSS JOIN e
    WHERE e.vec_id <> query_id
      AND round(list_cosine_similarity(qv, e.v), 6) >= {RADIUS_TAU}
    """,
)
def knn_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: ALL neighbors within a cosine radius, not a fixed k.

    The retrieval primitive dedup thresholds and recall evaluation need
    (top-k hides how many near neighbors exist; range search reports
    them all). The probe set broadcasts, so the scan is one streamed
    pass over the corpus with a per-row filter — cheaper than top-k
    (no window at all), and the output is bounded by the radius, which
    the caller picks for selectivity. The threshold compares the
    6dp-rounded cosine so the boundary decision is identical in both
    engines.

    Scale shape: zero shuffles — broadcast nested loop, map-side filter.
    At 100 TB the corpus side streams partition-parallel; with a large
    query set the same semantics move onto the LSH buckets
    (``knn_lsh_cosine``'s candidate join) with this exact scan as the
    in-bucket verifier.
    """
    emb = staged_vectors(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    return (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
        .filter(F.col("cosine6") >= RADIUS_TAU)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine6", 4).alias("cosine"),
        )
    )


#: MMR diverse re-rank: greedy steps (unrolled in the oracle), candidate
#: pool per query, relevance/diversity mix.
MMR_K = 3
MMR_CAND = 10
MMR_QUERIES = 5
MMR_LAMBDA = 0.7


@register(
    "knn_mmr_diverse",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {MMR_QUERIES}
    ), scored AS (
        SELECT query_id, e.vec_id, e.v,
               round(list_cosine_similarity(qv, e.v), 6) AS rel6,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC,
                            e.vec_id) AS rn
        FROM q CROSS JOIN e
        WHERE e.vec_id <> query_id
    ), cand AS (
        SELECT query_id, vec_id, v, rel6 FROM scored WHERE rn <= {MMR_CAND}
    ), s1 AS (
        SELECT query_id, vec_id, v, {MMR_LAMBDA} * rel6 AS score
        FROM cand
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY rel6 DESC, vec_id) = 1
    ), m2 AS (
        SELECT c.query_id, c.vec_id, c.v,
               {MMR_LAMBDA} * c.rel6
                 - {1 - MMR_LAMBDA} * round(list_cosine_similarity(c.v, s1.v), 6)
                 AS score
        FROM cand c JOIN s1 ON c.query_id = s1.query_id
        WHERE c.vec_id <> s1.vec_id
    ), s2 AS (
        SELECT query_id, vec_id, v, score FROM m2
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) = 1
    ), m3 AS (
        SELECT c.query_id, c.vec_id,
               {MMR_LAMBDA} * c.rel6
                 - {1 - MMR_LAMBDA} * greatest(
                       round(list_cosine_similarity(c.v, s1.v), 6),
                       round(list_cosine_similarity(c.v, s2.v), 6))
                 AS score
        FROM cand c
        JOIN s1 ON c.query_id = s1.query_id
        JOIN s2 ON c.query_id = s2.query_id
        WHERE c.vec_id <> s1.vec_id AND c.vec_id <> s2.vec_id
    ), s3 AS (
        SELECT query_id, vec_id, score FROM m3
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) = 1
    )
    SELECT query_id, 1 AS mmr_rank, vec_id AS selected_id,
           round(score, 4) AS mmr_score FROM s1
    UNION ALL
    SELECT query_id, 2, vec_id, round(score, 4) FROM s2
    UNION ALL
    SELECT query_id, 3, vec_id, round(score, 4) FROM s3
    """,
)
def knn_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diverse top-k: greedy re-rank trading relevance for diversity.

    Maximal Marginal Relevance (Carbonell & Goldstein 1998): after exact
    retrieval of a candidate pool, greedily pick k results maximizing
    ``lambda * rel(q, d) - (1 - lambda) * max_sim(d, already_picked)`` —
    the retrieval-augmentation staple that stops a RAG context window
    filling with near-duplicates of one passage. Genuinely sequential
    per query, so it runs as a grouped-map Pandas UDF over the candidate
    pool (pool size is the operator's constant, so each group is tiny);
    the oracle unrolls the same greedy loop as k CTE steps. Both engines
    score on 6dp-rounded cosines — the same ulp-absorption argument as
    ``knn_bruteforce_cosine_arrow`` — and break ties toward the smaller
    vec_id, so selection is deterministic and hash-stable.

    Scale shape: candidate generation is the broadcast nested-loop scan
    (or any ANN index upstream); the greedy stage touches only
    queries x MMR_CAND rows grouped by query — embarrassingly parallel
    across queries, O(k * pool) per group, no shuffle of the corpus.
    """
    import numpy as np
    import pandas as pd

    emb = staged_vectors(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    win = Window.partitionBy("query_id").orderBy(F.col("rel6").desc(), "vec_id")
    cand = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("rel6", F.round(paired_cosine(), 6))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= MMR_CAND)
        .select("query_id", "vec_id", "v", "rel6")
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["rel6", "vec_id"], ascending=[False, True])
        ids = pdf["vec_id"].to_numpy()
        rel = pdf["rel6"].to_numpy()
        mat = np.array(pdf["v"].tolist())  # (C, D)
        norms = np.linalg.norm(mat, axis=1)
        raw = (mat @ mat.T) / np.outer(norms, norms)  # (C, C)
        # Half-up (away from zero) like F.round/DuckDB round — np.round
        # is banker's and would flip a pick on an exact 6dp halfway tie.
        sim = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        picked: list[int] = []
        out = []
        for rank in range(1, min(MMR_K, len(ids)) + 1):
            best_i, best_score = -1, None
            for i in range(len(ids)):
                if i in picked:
                    continue
                div = max((sim[i, j] for j in picked), default=0.0)
                score = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * div
                if (
                    best_score is None
                    or score > best_score
                    or (score == best_score and ids[i] < ids[best_i])
                ):
                    best_i, best_score = i, score
            picked.append(best_i)
            out.append((pdf["query_id"].iloc[0], rank, ids[best_i],
                        best_score))
        return pd.DataFrame(
            out, columns=["query_id", "mmr_rank", "selected_id", "score_raw"]
        )

    return cand.groupBy("query_id").applyInPandas(
        greedy,
        schema="query_id long, mmr_rank int, selected_id long, score_raw double",
    ).select(
        "query_id",
        "mmr_rank",
        "selected_id",
        # Round JVM-side: Spark F.round is HALF_UP like DuckDB's round;
        # np.round is banker's and would flip exact-halfway cases.
        F.round("score_raw", 4).alias("mmr_score"),
    )


#: k-center greedy coreset: selection rounds (unrolled in the oracle) and
#: the deterministic seed (smallest vec_id).
KCENTER_K = 3


@register(
    "knn_kcenter_coreset",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), s1 AS (
        SELECT vec_id, v FROM e
        QUALIFY row_number() OVER (ORDER BY vec_id) = 1
    ), d1 AS (
        SELECT e.vec_id, e.v,
               round(1.0 - list_cosine_similarity(e.v, s1.v), 6) AS dmin
        FROM e CROSS JOIN s1 WHERE e.vec_id <> s1.vec_id
    ), s2 AS (
        SELECT vec_id, v, dmin FROM d1
        QUALIFY row_number() OVER (ORDER BY dmin DESC, vec_id) = 1
    ), d2 AS (
        SELECT d1.vec_id, d1.v,
               least(d1.dmin,
                     round(1.0 - list_cosine_similarity(d1.v, s2.v), 6))
                   AS dmin
        FROM d1 CROSS JOIN s2
        WHERE d1.vec_id <> s2.vec_id
    ), s3 AS (
        SELECT vec_id, dmin FROM d2
        QUALIFY row_number() OVER (ORDER BY dmin DESC, vec_id) = 1
    )
    SELECT (SELECT vec_id FROM s1) AS center_id, 1 AS pick, 0.0 AS coverage_radius
    UNION ALL
    SELECT vec_id, 2, round(dmin, 4) FROM s2
    UNION ALL
    SELECT vec_id, 3, round(dmin, 4) FROM s3
    """,
)
def knn_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset: pick the points farthest from all picks.

    Diversity-driven data selection (Sener & Savarese's core-set active
    learning; facility location in data pruning): start from a
    deterministic seed, then repeatedly take the point with the LARGEST
    distance to its nearest already-chosen center — the 2-approximation
    of the k-center objective. Each pick's ``coverage_radius`` (its dmin
    at selection time) is the certified covering bound after the
    previous picks. Distances are 6dp-rounded cosine distances, same
    ulp-absorption as the rest of the kNN family.

    Spark runs the loop the only way it scales: k bounded rounds, each a
    full map over the corpus with the (tiny) selected set broadcast,
    carrying a running per-point dmin column — no pairwise matrix, no
    shuffle except the 1-row argmax (an aggregate min over a negated
    struct). The oracle unrolls the identical rounds as CTEs.

    Scale shape: k scans with broadcast state, exactly like
    ``knn_kmeans_step`` iterated; argmax is a map-side-combined 1-row
    aggregate per round. O(k * corpus), embarrassingly parallel.
    """
    emb = staged_vectors(spark, sf_dir)
    seed = emb.orderBy("vec_id").limit(1)
    seed_row = seed.collect()[0]  # 1 row: the deterministic seed
    picks = [(seed_row.vec_id, 1, 0.0)]
    centers = [(seed_row.vec_id, seed_row.v)]
    # Per round the center is a LITERAL array, so its norm constant-folds;
    # the corpus norm is the staged loop-invariant column.
    cur = emb.filter(F.col("vec_id") != seed_row.vec_id).withColumn(
        "dmin",
        F.round(
            1.0
            - dot_product("v", F.lit(centers[0][1]))
            / (F.col("nrm") * l2_norm(F.lit(centers[0][1]))),
            6,
        ),
    )
    for pick_no in range(2, KCENTER_K + 1):
        # argmax dmin (tie: smallest id) as an aggregate min over a
        # lexicographic struct of (-dmin, vec_id) — map-side combined.
        best = (
            cur.select(
                F.min(
                    F.struct(
                        (-F.col("dmin")).alias("neg"),
                        F.col("vec_id").alias("k"),
                        F.col("v").alias("v"),
                        F.col("dmin").alias("d"),
                    )
                ).alias("b")
            )
            .collect()[0]
            .b
        )
        picks.append((best.k, pick_no, best.d))
        if pick_no < KCENTER_K:
            cur = cur.filter(F.col("vec_id") != best.k).withColumn(
                "dmin",
                F.least(
                    F.col("dmin"),
                    F.round(
                        1.0
                        - dot_product("v", F.lit(best.v))
                        / (F.col("nrm") * l2_norm(F.lit(best.v))),
                        6,
                    ),
                ),
            )
    return spark.createDataFrame(
        picks, "center_id long, pick int, cov double"
    ).select(
        "center_id",
        "pick",
        # Spark round (HALF_UP away from zero) matches DuckDB round;
        # Python's round is banker's and would flip exact-halfway cases.
        F.round("cov", 4).alias("coverage_radius"),
    )


def _registered_oracle(name: str) -> str:
    from data_preparation_plugin_spark.plans.registry import QUERIES

    return QUERIES[name].oracle


# The audit oracle is the two member oracles verbatim, joined as CTEs: any
# edit to either member's SQL flows into the audit automatically.
_RECALL_AUDIT_ORACLE = f"""
    WITH exact_side AS (
        SELECT query_id, neighbor_id FROM ({_registered_oracle("knn_bruteforce_cosine")})
    ), approx_side AS (
        SELECT query_id, neighbor_id FROM ({_registered_oracle("knn_ivf_cosine")})
    ), hits AS (
        SELECT e.query_id, count(*) AS n_hits
        FROM exact_side e JOIN approx_side a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    ), totals AS (
        SELECT query_id, count(*) AS n_exact
        FROM exact_side GROUP BY query_id
    )
    SELECT t.query_id,
           CAST(t.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST((coalesce(h.n_hits, 0) * 10000) // t.n_exact AS BIGINT)
               AS recall_bp
    FROM totals t LEFT JOIN hits h ON t.query_id = h.query_id
"""


@register(
    "knn_ivf_recall_audit",
    category="similarity",
    oracle=_RECALL_AUDIT_ORACLE,
)
def knn_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against the exact baseline, per query.

    The acceptance metric every ANN deployment is tuned by: of the true
    top-k neighbors (exact brute force), how many did the
    (n_cells, nprobe) IVF configuration return? Composes the two
    REGISTERED builders directly — and the oracle splices the two
    registered oracle texts as CTEs — so the audit can never drift from
    the operators it audits. Recall is integer basis points
    (``hits * 10000 div k``), never a float. This is the measurement
    loop behind choosing nprobe: recall_bp here, candidate volume from
    the cell histogram, and the product decides the CPU/recall trade.

    Scale shape: both members are broadcast-probe plans (bounded query
    set); the audit adds one left-semi join keyed on
    (query_id, neighbor_id) — k rows per query on each side — and a
    bounded-key aggregate. Cost is dominated by the members themselves.
    """
    exact = knn_bruteforce_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = knn_ivf_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    # Both member outputs are bounded (queries x k rows) by construction,
    # so the audit joins broadcast instead of sort-merging.
    hits = exact.join(
        F.broadcast(approx), ["query_id", "neighbor_id"], "left_semi"
    )
    n_exact = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    n_hits = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_exact.join(F.broadcast(n_hits), "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.expr(
                "(coalesce(n_hits, 0) * 10000) div n_exact"
            ).alias("recall_bp"),
        )
    )



@register(
    "knn_scalar_quantize",
    category="similarity",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               unnest(embedding::DOUBLE[]) AS v,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ), st AS (
        SELECT dim, min(v) AS mn, max(v) AS mx
        FROM e GROUP BY dim
        HAVING max(v) > min(v)
    ), q AS (
        SELECT e.vec_id, e.dim, e.v, st.mn, st.mx,
               CAST(round((e.v - st.mn) * 255 / (st.mx - st.mn), 0)
                    AS INTEGER) AS code
        FROM e JOIN st ON e.dim = st.dim
    ), r AS (
        SELECT vec_id, dim, code,
               v - (mn + code * (mx - mn) / 255) AS err
        FROM q
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(code) AS BIGINT) AS code_sum,
           array_to_string(list(code ORDER BY dim), ',') AS codes,
           round(sum(err * err) / count(*), 9) AS mse
    FROM r
    GROUP BY vec_id
    """,
)
def knn_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (SQ) of the embedding corpus + error audit.

    The standard vector-index compression step (FAISS ``SQ8``, Milvus
    ``SQ8``, pgvector ``halfvec`` cousins): per-dimension [min, max] over
    the corpus defines a 256-level uniform grid; each float becomes one
    byte (16x smaller than float64, 4x smaller than float32), and ADC
    search decodes against the same grid. The audit emits the exact code
    stream plus per-vector reconstruction MSE — the number a pipeline
    watches to decide SQ8 vs PQ vs float16.

    Spark shape, built to survive 100 TB of vectors: the per-dimension
    range is one map-side-combinable aggregate over the exploded
    (dim, value) stream — ``EMBEDDING_DIM`` rows out — broadcast back
    onto the stream; quantize/dequantize are elementwise expressions
    inside one codegen stage, and the only wide exchange is the final
    per-vector regroup. Constant dimensions (mx == mn) are dropped on
    both sides — they carry zero information and their grid is
    degenerate. ``round`` before the INT cast is HALF_UP in Spark and
    half-away in DuckDB — identical on the non-negative grid scale. The
    9dp round on MSE absorbs summation-order ulps (the established
    moments idiom, cf. ``embedding_standardize``); codes and their sum
    are exact integers, so the compressed index itself is hash-checked,
    not just its error summary.
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("dim", "v"))
        .select(
            "vec_id",
            (F.col("dim") + 1).alias("dim"),
            F.col("v").cast("double").alias("v"),
        )
    )
    stats = (
        emb.groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .filter(F.col("mx") > F.col("mn"))
    )
    code = F.round(
        (F.col("v") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn")), 0
    ).cast("int")
    quantized = (
        emb.join(F.broadcast(stats), "dim")
        .withColumn("code", code)
        .withColumn(
            "err",
            F.col("v")
            - (
                F.col("mn")
                + F.col("code") * (F.col("mx") - F.col("mn")) / 255
            ),
        )
    )
    return quantized.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum("code").cast("bigint").alias("code_sum"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("dim").alias("dim"),
                            F.col("code").alias("code"),
                        )
                    )
                ),
                lambda x: x.getField("code").cast("string"),
            ),
            ",",
        ).alias("codes"),
        F.round(
            F.sum(F.col("err") * F.col("err")) / F.count(F.lit(1)), 9
        ).alias("mse"),
    )


#: Fixed-point scale for the exact Gram accumulation (|v| <= 1: products
#: fit int64 with headroom through ~1e9 vectors at this scale).
GRAM_SCALE = 10_000

#: The |component| <= 1 precondition above, made an EXPLICIT shared gate
#: (r16 adversarial-embeddings edge axis): a 1e15-component vector
#: quantizes to 1e19, which DuckDB refuses to cast to BIGINT while
#: numpy's ``astype("int64")`` silently WRAPS — the worst divergence
#: class, an oracle error masking engine-side corruption. Out-of-domain
#: vectors are excluded on both engines rather than clamped so the audit
#: never reports a Gram of data it silently altered.
GRAM_DOMAIN_SQL = (
    "list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) <= 1.0"
)


def gram_domain(v: Column | str) -> Column:
    """Spark twin of :data:`GRAM_DOMAIN_SQL` (on the DOUBLE-cast array)."""
    return F.array_max(F.transform(v, F.abs)) <= 1.0


@register(
    "embedding_gram_matrix",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS dim,
               CAST(round(unnest(embedding::DOUBLE[]) * {GRAM_SCALE}, 0)
                    AS BIGINT) AS q
        FROM embeddings
        WHERE {GRAM_DOMAIN_SQL}
    )
    SELECT a.dim AS i,
           b.dim AS j,
           CAST(sum(a.q * b.q) AS BIGINT) AS gram
    FROM e a
    JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY a.dim, b.dim
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix XᵀX of the embedding corpus (distributed PCA step).

    The front half of every spectral pipeline over embeddings — PCA /
    whitening / low-rank compression all start from the d×d Gram (or
    covariance) matrix, and at corpus scale the ONLY viable plan is
    partial Gram accumulation: each partition reduces its vectors to one
    d×d matrix locally, and the shuffle moves d(d+1)/2 scalars per
    partition instead of n·d elements. The eigen-decomposition of the
    2080-cell result is a driver-side triviality; producing the matrix is
    the distributed problem, and it is solved here with one Arrow
    ``mapInPandas`` stage (a single int64 BLAS-shaped ``QᵀQ`` per batch)
    feeding a bounded (i, j)-keyed aggregate.

    Exactness: elements convert to fixed-point int64 BEFORE any product
    (sign-aware half-away rounding, matching DuckDB ``round``), so every
    partial matrix and the final sums are exact integers — no float
    summation order across partitions, batches, or engines. The oracle
    computes the identical integers via an (i ≤ j) self-join; the hash
    match proves the vectorized partial-aggregation path lossless.
    Vectors outside the fixed-point domain (:data:`GRAM_DOMAIN_SQL`) are
    excluded on both engines — see the constant's rationale.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).filter(gram_domain("v"))

    def partial_gram(batches):
        rows, cols = np.triu_indices(EMBEDDING_DIM)
        for pdf in batches:
            mat = np.array(pdf["v"].tolist())  # (B, D) float64
            scaled = mat * GRAM_SCALE
            q = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
                "int64"
            )
            gram = q.T @ q  # (D, D) exact int64
            yield pd.DataFrame(
                {
                    "i": rows + 1,
                    "j": cols + 1,
                    "s": gram[rows, cols],
                }
            )

    partials = emb.mapInPandas(partial_gram, "i int, j int, s long")
    return partials.groupBy("i", "j").agg(
        F.sum("s").cast("bigint").alias("gram")
    )


@register(
    "embedding_pca_whiten_audit",
    category="similarity",
    oracle=f"""
    -- The oracle pins the INVARIANTS, not the component count: the true
    -- rank of an adversarial corpus (duplicates, collinear rows, the
    -- zero vector — r16 edge axis) is not SQL-computable, but whitening
    -- still PROMISES (a) rank bounded by the distinct nonzero quantized
    -- rows, (b) unit variance on every kept component, (c) zero
    -- off-diagonal covariance. Those three are checkable on any input.
    SELECT CAST(max(len(embedding)) AS INTEGER) AS d,
           TRUE AS rank_bound_ok,
           TRUE AS unit_variance_ok,
           CAST(0 AS BIGINT) AS n_offdiag_violations
    FROM embeddings
    """,
)
def embedding_pca_whiten_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening end-to-end, audited by its defining invariant.

    The back half of the spectral pipeline ``embedding_gram_matrix``
    fronts: eigendecompose the (exact, driver-collected — d(d+1)/2 cells,
    bounded by DIMENSION, never by data) second-moment matrix, build the
    whitening rotation W = V·Λ^(-1/2), broadcast it into one Arrow stage
    that rotates every vector, then re-accumulate the Gram of the
    WHITENED corpus the same partial-Gram way and check the definition:
    it must be the identity (unit variance per component, zero
    off-diagonals) within 1e-6. The oracle pins the invariants — rank
    bounded by the distinct nonzero quantized rows, every kept component
    unit variance, zero violations — the tolerance-bit oracle style the
    HLL/approx sketches established (DuckDB cannot eigendecompose; it
    CAN check what whitening promises). Reported as booleans, not raw
    counts: the true rank of an adversarial corpus (duplicates,
    collinear rows, the zero vector — r16 edge axis) is not
    SQL-computable, but the PROMISES hold for any input, so the audit's
    contract survives rank-deficient corpora instead of predicting a
    cardinality the oracle cannot know. The corpus is staged through the
    same :func:`gram_domain` gate as the moment matrix on every pass.

    Scale shape: the corpus is touched thrice (moment pass, quantized
    distinct-row rank bound, rotate/verify pass), each a single
    Arrow/codegen stage with a d²- or scalar-sized shuffle; the eig
    is O(d³) on 64×64 — a driver triviality. Float tolerance absorbs the
    whitened Gram's summation-order ulps (deviations land ~1e-12,
    six orders below the gate).
    """
    import numpy as np
    import pandas as pd

    gram_rows = embedding_gram_matrix(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).filter(gram_domain("v"))
    n_vecs = emb.count()
    d = EMBEDDING_DIM
    # Rank can never exceed the number of DISTINCT nonzero rows of the
    # quantized corpus the moment matrix was accumulated from — an
    # oracle-checkable bound where the exact rank is not.
    qarr = F.transform(
        "v",
        lambda e: (F.signum(e) * F.floor(F.abs(e) * GRAM_SCALE + 0.5))
        .cast("long"),
    )
    rank_bound = min(
        emb.select(qarr.alias("q"))
        .filter(F.exists("q", lambda x: x != 0))
        .distinct()
        .count(),
        d,
    )
    if n_vecs == 0 or rank_bound == 0:
        # Degenerate-but-in-contract corpora (everything out of the
        # fixed-point domain, or nothing quantizes to a nonzero row):
        # the second moment is zero/undefined, zero components are
        # kept, and every invariant holds vacuously — return the
        # oracle's constants directly instead of dividing by n_vecs=0
        # (NaN matrix -> eigh LinAlgError) or aggregating an empty
        # whitened Gram (NULL booleans).
        return spark.range(1).select(
            F.lit(d).alias("d"),
            F.lit(True).alias("rank_bound_ok"),
            F.lit(True).alias("unit_variance_ok"),
            F.lit(0).cast("bigint").alias("n_offdiag_violations"),
        )
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r.i - 1, r.j - 1] = r.gram
        g[r.j - 1, r.i - 1] = r.gram
    second_moment = g / (n_vecs * float(GRAM_SCALE) ** 2)
    vals, vecs = np.linalg.eigh(second_moment)
    keep = vals > 1e-12
    w_rot = vecs[:, keep] / np.sqrt(vals[keep])  # (d, k)
    n_components = int(keep.sum())
    if n_components == 0:
        # Nonzero quantized rows exist but every eigenvalue sits under
        # the keep threshold (a single nonzero row diluted by a huge
        # corpus): zero kept components, invariants vacuous — same
        # closed form as above, not an empty-aggregate NULL.
        return spark.range(1).select(
            F.lit(d).alias("d"),
            F.lit(True).alias("rank_bound_ok"),
            F.lit(True).alias("unit_variance_ok"),
            F.lit(0).cast("bigint").alias("n_offdiag_violations"),
        )

    def whitened_gram(batches):
        rows, cols = np.triu_indices(n_components)
        for pdf in batches:
            mat = np.array(pdf["v"].tolist())  # (B, d)
            # Whiten the SAME corpus the moment matrix describes — the
            # fixed-point one (otherwise the ~1e-4 quantization residual
            # would swamp the 1e-6 identity gate).
            scaled = mat * GRAM_SCALE
            q = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
            z = (q / GRAM_SCALE) @ w_rot  # (B, k) whitened
            gw = z.T @ z
            yield pd.DataFrame(
                {"i": rows + 1, "j": cols + 1, "s": gw[rows, cols]}
            )

    gw = (
        emb.mapInPandas(whitened_gram, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("g"))
        .select(
            "i",
            "j",
            (F.col("g") / n_vecs).alias("cov"),
        )
    )
    return gw.agg(
        F.lit(d).alias("d"),
        F.lit(bool(n_components <= rank_bound)).alias("rank_bound_ok"),
        (
            F.sum(
                F.when(
                    (F.col("i") == F.col("j"))
                    & (F.abs(F.col("cov") - 1.0) < 1e-6),
                    1,
                ).otherwise(0)
            )
            == F.lit(n_components)
        ).alias("unit_variance_ok"),
        F.sum(
            F.when(
                (F.col("i") != F.col("j"))
                & (F.abs(F.col("cov")) >= 1e-6),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_offdiag_violations"),
    )


#: Matryoshka audit: prefix length retained from the full embedding.
MATRYOSHKA_DIMS = 32


@register(
    "embedding_matryoshka_audit",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               (embedding::DOUBLE[])[1:{MATRYOSHKA_DIMS}] AS tv
        FROM embeddings
        WHERE {NONZERO_VEC_SQL}
          AND list_dot_product((embedding::DOUBLE[])[1:{MATRYOSHKA_DIMS}],
                               (embedding::DOUBLE[])[1:{MATRYOSHKA_DIMS}]) > 0
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, tv AS qtv FROM e
        WHERE vec_id < {N_QUERY_VECS}
    ), full_nn AS (
        SELECT query_id, vec_id AS full_nn,
               round(list_cosine_similarity(qv, v), 6) AS full_cosine
        FROM (
            SELECT query_id, e.vec_id, qv, v,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qv, e.v), 6)
                                DESC, e.vec_id) AS rn
            FROM q CROSS JOIN e WHERE e.vec_id <> query_id
        ) WHERE rn = 1
    ), trunc_nn AS (
        SELECT query_id, vec_id AS trunc_nn,
               round(list_cosine_similarity(qtv, tv), 6) AS trunc_cosine
        FROM (
            SELECT query_id, e.vec_id, qtv, tv,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qtv, e.tv), 6)
                                DESC, e.vec_id) AS rn
            FROM q CROSS JOIN e WHERE e.vec_id <> query_id
        ) WHERE rn = 1
    )
    SELECT f.query_id, f.full_nn, t.trunc_nn,
           round(f.full_cosine, 4) AS full_cosine,
           round(t.trunc_cosine, 4) AS trunc_cosine,
           CAST(CASE WHEN f.full_nn = t.trunc_nn THEN 1 ELSE 0 END
                AS BIGINT) AS agree
    FROM full_nn f JOIN trunc_nn t USING (query_id)
    """,
)
def embedding_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: does the {MATRYOSHKA_DIMS}-dim prefix
    keep the same nearest neighbor as the full vector?

    Matryoshka-style embeddings promise that a prefix of the dimensions
    is itself a usable embedding at a fraction of the storage/compute;
    before committing an index to truncated vectors, measure what the
    cut costs.  Per probe query: exact top-1 under full cosine vs top-1
    under prefix cosine, with the agreement bit — aggregate ``agree``
    upstream for the retention rate.  Same round-6 tie discipline as
    ``knn_bruteforce_cosine`` keeps the argmax engine-exact.

    Scale shape: the probe set broadcasts; both scans stream the corpus
    once each behind the same broadcast nested loop as the brute-force
    baseline (and the truncated scan does {MATRYOSHKA_DIMS}/64ths of
    the flops — the point being audited).  No shuffle of the corpus.
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            F.slice(
                F.col("embedding").cast("array<double>"), 1, MATRYOSHKA_DIMS
            ).alias("tv"),
        )
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("tnrm", l2_norm(F.col("tv")))
        .filter(nonzero_vec("v") & nonzero_vec("tv"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("tv").alias("qtv"),
        F.col("nrm").alias("qnrm"),
        F.col("tnrm").alias("qtnrm"),
    )

    def top1(score_a: str, score_b: str, out_id: str, out_cos: str):
        norms = {"qv": "qnrm", "tv": "tnrm", "v": "nrm", "qtv": "qtnrm"}
        scored = emb.join(
            F.broadcast(queries), F.col("vec_id") != F.col("query_id")
        ).withColumn(
            "c6",
            F.round(
                paired_cosine(
                    score_a, score_b, norms[score_a], norms[score_b]
                ),
                6,
            ),
        )
        win = Window.partitionBy("query_id").orderBy(
            F.col("c6").desc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                F.col("vec_id").alias(out_id),
                F.col("c6").alias(out_cos),
            )
        )

    full = top1("qv", "v", "full_nn", "full_c6")
    trunc = top1("qtv", "tv", "trunc_nn", "trunc_c6")
    return full.join(F.broadcast(trunc), "query_id").select(
        "query_id",
        "full_nn",
        "trunc_nn",
        F.round("full_c6", 4).alias("full_cosine"),
        F.round("trunc_c6", 4).alias("trunc_cosine"),
        F.when(F.col("full_nn") == F.col("trunc_nn"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("agree"),
    )


@register(
    "knn_ivf_cell_balance",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), cents AS (
        SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {IVF_N_CELLS}
    ), assigned AS (
        SELECT vec_id, cent_id AS cell FROM (
            SELECT e.vec_id, cents.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, cv), 6) DESC,
                                cent_id) AS crn
            FROM e CROSS JOIN cents
        ) WHERE crn = 1
    ), sized AS (
        SELECT cell, count(*) AS n_vectors FROM assigned GROUP BY cell
    )
    SELECT cell,
           CAST(n_vectors AS BIGINT) AS n_vectors,
           CAST(n_vectors * 10000 // sum(n_vectors) OVER () AS BIGINT)
               AS share_bp,
           CAST(n_vectors * count(*) OVER () * 10000
                // sum(n_vectors) OVER () AS BIGINT) AS load_factor_bp
    FROM sized
    """,
)
def knn_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index balance audit: per-cell occupancy and load factor.

    Probe cost in an IVF index is the size of the cells probed — a
    lopsided codebook makes query latency bimodal and nprobe tuning
    meaningless.  This audit reports each cell's occupancy, corpus
    share, and load factor (occupancy x n_cells / total; 10000 bp =
    perfectly balanced), using the SAME deterministic assignment as the
    registered ``knn_ivf_cosine`` (same constants, same round-6
    tie-break) so the audit measures the index the engine actually
    probes.  All ratios are integer fixed-point — engine-exact.

    Scale shape: assignment is the same narrow broadcast-codebook map
    as index build; the audit itself aggregates to {IVF_N_CELLS} rows
    — the windows run on a relation the size of the codebook.
    """
    emb = staged_vectors(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < IVF_N_CELLS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    assign_win = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos", F.round(paired_cosine("v", "cv", "nrm", "cnrm"), 6)
        )
        .withColumn("crn", F.row_number().over(assign_win))
        .filter(F.col("crn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    sized = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    return sized.select(
        "cell",
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.expr(
            "CAST(n_vectors * 10000 DIV sum(n_vectors) OVER () AS BIGINT)"
        ).alias("share_bp"),
        F.expr(
            "CAST(n_vectors * count(*) OVER () * 10000"
            " DIV sum(n_vectors) OVER () AS BIGINT)"
        ).alias("load_factor_bp"),
    )


#: Johnson-Lindenstrauss target dimension (64 -> 16).
JL_OUT_DIM = 16
#: Fixed-point scale for exact integer embedding components.
JL_SCALE = 1_000_000
#: Probe set size for the distance-preservation audit.
JL_PROBE = 10


@register(
    "embedding_random_projection_jl",
    category="similarity",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, i - 1 AS i,
               CAST(floor(CAST(x AS DOUBLE) * {JL_SCALE} + 0.5)
                    AS HUGEINT) AS qx
        FROM (SELECT vec_id,
                     unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings
              WHERE vec_id < {JL_PROBE})
    ), signs AS (
        SELECT i.x AS i, j.x AS j,
               CASE WHEN ('0x' || substr(md5(CAST(i.x AS VARCHAR) || ':'
                          || CAST(j.x AS VARCHAR)), 1, 2))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM generate_series(0, 63) AS i(x),
             generate_series(0, {JL_OUT_DIM - 1}) AS j(x)
    ), proj AS (
        SELECT q.vec_id, s.j, sum(s.s * q.qx) AS p
        FROM q JOIN signs s ON q.i = s.i
        GROUP BY q.vec_id, s.j
    ), dot64 AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               sum(a.qx * b.qx) AS dot_orig
        FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ), dot16 AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               sum(a.p * b.p) AS dot_proj_scaled
        FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    )
    SELECT d.vec_a, d.vec_b,
           CAST(d.dot_orig AS BIGINT) AS dot_orig,
           CAST(p.dot_proj_scaled AS BIGINT) AS dot_proj_scaled
    FROM dot64 d JOIN dot16 p USING (vec_a, vec_b)
    """,
)
def embedding_random_projection_jl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss sign projection, integer-exact end to end.

    The dimensionality-reduction front half of large-scale ANN
    (64 -> {JL_OUT_DIM} dims = 4x cheaper distance math and index
    memory): the Achlioptas ±1 sign matrix, DERANDOMIZED — each sign
    is the md5 parity of "(i:j)", so builder and oracle regenerate the
    identical matrix with no RNG state shipped.  Components quantize
    to e6 fixed point FIRST (floor(x*s + 0.5) — identical half-up in
    both engines where round()'s tie rule would diverge on negatives), so projections and both dot products are
    exact wide-integer arithmetic; the audit emits, per probe pair,
    the original 64-dim dot next to the projected dot (carrying the
    k-fold JL scale factor — divide by k downstream; kept raw here so
    every value stays exact integer) — the distance-preservation
    check as data, no float anywhere.

    Scale shape: the sign matrix is 64x{JL_OUT_DIM} rows, broadcast;
    projection is one explode + equi-join + (vec, j) aggregate —
    map-side combinable, the corpus never self-joins; only the
    {JL_PROBE}-vector probe set pairs up for the audit.
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < JL_PROBE)
        .select(
            "vec_id",
            F.posexplode("embedding").alias("i", "x"),
        )
        .select(
            "vec_id",
            "i",
            F.expr(
                f"CAST(floor(CAST(x AS DOUBLE) * {JL_SCALE} + 0.5)"
                f" AS DECIMAL(38, 0))"
            ).alias("qx"),
        )
    )
    signs = (
        spark.range(64)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(
            spark.range(JL_OUT_DIM).select(
                F.col("id").cast("int").alias("j")
            )
        )
        .select(
            "i",
            "j",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("i").cast("string"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        2,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    proj = (
        emb.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("qx")).alias("p"))
    )
    a64, b64 = emb.alias("a"), emb.alias("b")
    dot64 = (
        a64.join(
            b64,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .agg(F.sum(F.col("a.qx") * F.col("b.qx")).alias("dot_orig"))
    )
    ap, bp = proj.alias("a"), proj.alias("b")
    dot16 = (
        ap.join(
            bp,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .agg(F.sum(F.col("a.p") * F.col("b.p")).alias("dot_proj_scaled"))
    )
    return dot64.join(dot16, ["vec_a", "vec_b"]).select(
        "vec_a",
        "vec_b",
        F.col("dot_orig").cast("bigint").alias("dot_orig"),
        F.col("dot_proj_scaled").cast("bigint").alias("dot_proj_scaled"),
    )


def _flip_sql(expr: str, i: int) -> str:
    """DuckDB: the bucket string with bit position i (1-based) flipped."""
    return (
        f"substr({expr}, 1, {i - 1}) || "
        f"(CASE WHEN substr({expr}, {i}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substr({expr}, {i + 1}, {N_HYPERPLANES - i})"
    )


def _flip_col(col: Column, i: int) -> Column:
    """Spark twin of :func:`_flip_sql`: bucket with bit i flipped."""
    flipped = F.when(F.substring(col, i, 1) == "1", F.lit("0")).otherwise(
        F.lit("1")
    )
    return F.concat(
        F.substring(col, 1, i - 1),
        flipped,
        F.substring(col, i + 1, N_HYPERPLANES - i),
    )


#: Oracle-side probe fan-out shared by ``knn_lsh_multiprobe`` and the
#: rerank pipeline's recall stage: the query's own bucket plus every
#: Hamming-1 flip, as a UNION over the ``q`` CTE. ONE definition (r13
#: review) so a probe-rule change cannot desynchronize the pipeline
#: from the standalone index query; :func:`_multiprobe_scored` is the
#: Spark twin.
_PROBE_UNIONS_SQL = "".join(
    f" UNION ALL SELECT query_id, qv, {_flip_sql('qbucket', i)} FROM q"
    for i in range(1, N_HYPERPLANES + 1)
)


def _multiprobe_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared multi-probe recall stage (Spark side of _PROBE_UNIONS_SQL).

    Bucketed corpus; per query the bucket plus every Hamming-1 flip is
    GENERATED as 1 + N_HYPERPLANES probe keys and exploded on the (tiny,
    broadcast) probe side, so the candidate fetch stays a bucket
    EQUI-join; each candidate carries its rounded cosine. Consumers add
    their own ranking window (`knn_lsh_multiprobe`: top-K report; the
    rerank pipeline: RERANK_SHORTLIST recall stage)."""
    # Same norm placement as knn_lsh_cosine: candidates ~9·rows/2^planes
    # per query, so norms fold per surviving pair, never corpus-wide.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(nonzero_vec("v")).withColumn("bucket", _bucket_col(F.col("v")))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        l2_norm(F.col("v")).alias("qnrm"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    _flip_col(F.col("bucket"), i)
                    for i in range(1, N_HYPERPLANES + 1)
                ],
            )
        ).alias("pbucket"),
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("pbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
    )


#: Two-stage retrieval: the ANN index proposes RERANK_SHORTLIST
#: candidates per query (recall stage); a cross-feature scorer re-orders
#: just those rows (precision stage). The fusion weight mixes vector
#: cosine with lexical token Jaccard 50/50 — the deterministic stand-in
#: for a learned cross-encoder score (swap the fused expression for a
#: model UDF in production; the plan is identical).
RERANK_SHORTLIST = 20


@register(
    "knn_rerank_crossfeatures",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {{bucket_sql}} AS bucket
        FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM e
        WHERE vec_id < {N_QUERY_VECS}
    ), probes AS (
        SELECT query_id, qv, qbucket AS pbucket FROM q{{probe_unions}}
    ), shortlist AS (
        SELECT query_id, neighbor_id, cosine6 FROM (
            SELECT query_id,
                   e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(qv, e.v), 6) AS cosine6,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qv, e.v), 6)
                                DESC, e.vec_id) AS arn
            FROM probes p
            JOIN e ON e.bucket = p.pbucket AND e.vec_id <> p.query_id
        ) WHERE arn <= {RERANK_SHORTLIST}
    ), toks AS (
        SELECT doc_id,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+'))
                   AS tk
        FROM documents
    ), feats AS (
        SELECT s.query_id, s.neighbor_id, s.cosine6,
               CAST(len(list_intersect(qt.tk, ct.tk)) AS BIGINT) AS n_common,
               CAST(len(list_distinct(list_concat(qt.tk, ct.tk))) AS BIGINT)
                   AS n_union
        FROM shortlist s
        JOIN toks qt ON qt.doc_id = s.query_id
        JOIN toks ct ON ct.doc_id = s.neighbor_id
    ), fused AS (
        SELECT query_id, neighbor_id, n_common, n_union,
               round(0.5 * cosine6
                     + 0.5 * (n_common * 1.0 / n_union), 6) AS score6
        FROM feats
    )
    SELECT query_id, neighbor_id,
           round(score6, 4) AS score,
           n_common, n_union, rn
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY score6 DESC, neighbor_id) AS rn
          FROM fused)
    WHERE rn <= {TOP_K}
    """.replace("{bucket_sql}", _bucket_sql("embedding::DOUBLE[]")).replace(
        "{probe_unions}",
        _PROBE_UNIONS_SQL,
    ),
)
def knn_rerank_crossfeatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: ANN recall, then a cross-feature rerank.

    The deployed-RAG pipeline shape the single-stage queries stop short
    of: a cheap index proposes a per-query SHORTLIST — the MULTI-PROBE
    LSH fetch (the query's bucket plus every Hamming-1 flip as generated
    probe keys, see ``knn_lsh_multiprobe``) ranked by rounded cosine,
    the recall stage — and only those ``queries x RERANK_SHORTLIST``
    pairs are re-scored by an expensive PAIRWISE scorer that sees BOTH
    sides' content — a cross-encoder in production, here its
    deterministic stand-in: 50/50 fusion of vector cosine and lexical
    token Jaccard between the query document's text and the candidate's
    (``doc_id``/``vec_id`` align 1:1 in the fixture). Fusing vector and
    lexical evidence is what repairs ANN's characteristic misses —
    paraphrases the embedding collapses and keyword matches it
    underweights; multi-probe recall is what keeps the fused winners
    reachable (single-bucket recall left ``knn_rerank_recall_audit``'s
    ceiling near zero, the r13 diagnosis that motivated both operators).

    Scale shape: stage 1 stays an LSH EQUI-join — the 9 probe keys per
    query are generated and exploded on the (tiny, broadcast) probe
    side, so each query touches ~9 x corpus/2^planes candidates, never
    the corpus — plus a bounded per-query top-R window. Stage 2 touches
    text for exactly the shortlist keys: the (query_id, neighbor_id)
    pairs broadcast to join ``documents`` twice — query side and
    candidate side — so document text NEVER shuffles and the expensive
    scorer runs on queries x R rows, a vanishing fraction of the corpus.
    Swapping the fused expression for a model-scoring Pandas UDF changes
    nothing in the plan: the rerank cost stays candidate-bounded, which
    is the entire point of retrieve-then-rerank.
    """
    from data_preparation_plugin_spark.functions.text import tokens as _toks

    arn_win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    shortlist = (
        _multiprobe_scored(spark, sf_dir)
        .withColumn("arn", F.row_number().over(arn_win))
        .filter(F.col("arn") <= RERANK_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine6")
    )
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_toks(F.col("text"))).alias("tk")
    )
    qt = toks.select(
        F.col("doc_id").alias("query_id"), F.col("tk").alias("q_tk")
    )
    feats = (
        F.broadcast(shortlist)
        .join(qt, "query_id")
        .join(toks, F.col("doc_id") == F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cosine6",
            F.size(F.array_intersect("q_tk", "tk"))
            .cast("long")
            .alias("n_common"),
            F.size(F.array_union("q_tk", "tk")).cast("long").alias("n_union"),
        )
    )
    fused = feats.withColumn(
        "score6",
        F.round(
            0.5 * F.col("cosine6")
            + 0.5 * (F.col("n_common") * F.lit(1.0) / F.col("n_union")),
            6,
        ),
    )
    rk_win = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("rn", F.row_number().over(rk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score6", 4).alias("score"),
            "n_common",
            "n_union",
            "rn",
        )
    )


# The audit oracle splices the registered rerank oracle verbatim as a CTE
# (the knn_ivf_recall_audit pattern): edits to the rerank's SQL flow into
# the audit automatically, so the two can never drift.
_RERANK_AUDIT_ORACLE = """
    WITH pipeline AS (
        SELECT query_id, neighbor_id FROM ({rerank})
    ), e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {bucket} AS bucket
        FROM embeddings
        WHERE {nonzero}
    ), toks AS (
        SELECT doc_id,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+'))
                   AS tk
        FROM documents
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM e
        WHERE vec_id < {nq}
    ), fused_all AS (
        SELECT q.query_id,
               e.vec_id AS neighbor_id,
               ({hamming} <= 1) AS in_probed,
               round(0.5 * round(list_cosine_similarity(qv, e.v), 6)
                     + 0.5 * (len(list_intersect(qt.tk, ct.tk)) * 1.0
                              / len(list_distinct(list_concat(qt.tk, ct.tk)))),
                     6) AS score6
        FROM q
        JOIN e ON e.vec_id <> q.query_id
        JOIN toks qt ON qt.doc_id = q.query_id
        JOIN toks ct ON ct.doc_id = e.vec_id
    ), reachable_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score6 DESC, neighbor_id) AS rn
            FROM fused_all WHERE in_probed)
        WHERE rn <= {k}
    ), global_top AS (
        SELECT query_id, in_probed FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score6 DESC, neighbor_id) AS rn
            FROM fused_all)
        WHERE rn <= {k}
    ), rerank_agg AS (
        SELECT t.query_id,
               count(*) AS n_reachable,
               sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_hits
        FROM reachable_top t
        LEFT JOIN pipeline p
          ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
        GROUP BY t.query_id
    ), ceiling_agg AS (
        SELECT query_id,
               count(*) AS n_global,
               sum(CASE WHEN in_probed THEN 1 ELSE 0 END) AS n_in_probed
        FROM global_top GROUP BY query_id
    )
    SELECT r.query_id,
           CAST(r.n_reachable AS BIGINT) AS n_reachable,
           CAST(r.n_hits AS BIGINT) AS n_hits,
           CAST((r.n_hits * 10000) // r.n_reachable AS BIGINT)
               AS rerank_recall_bp,
           CAST(c.n_global AS BIGINT) AS n_global,
           CAST(c.n_in_probed AS BIGINT) AS n_in_probed,
           CAST((c.n_in_probed * 10000) // c.n_global AS BIGINT)
               AS ceiling_bp
    FROM rerank_agg r JOIN ceiling_agg c ON r.query_id = c.query_id
"""


@register(
    "knn_rerank_recall_audit",
    category="similarity",
    oracle=_RERANK_AUDIT_ORACLE.format(
        rerank=_registered_oracle("knn_rerank_crossfeatures"),
        bucket=_bucket_sql("embedding::DOUBLE[]"),
        nonzero=NONZERO_VEC_SQL,
        hamming=" + ".join(
            f"(CASE WHEN substr(e.bucket, {i}, 1) <> "
            f"substr(q.qbucket, {i}, 1) THEN 1 ELSE 0 END)"
            for i in range(1, N_HYPERPLANES + 1)
        ),
        nq=N_QUERY_VECS,
        k=TOP_K,
    ),
)
def knn_rerank_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-isolated quality audit of the two-stage retrieval pipeline:
    rerank recall over REACHABLE candidates + the index-geometry ceiling.

    Two axes, each blaming exactly one stage. ``rerank_recall_bp``: of
    the exact fused-score top-k AMONG the candidates the pipeline's
    multi-probe fetch can reach (Hamming ≤ 1 from the query's bucket —
    the best ANY rerank over this index could return), how many did the
    shortlist-capped pipeline (``knn_rerank_crossfeatures``) actually
    return? A shortfall here blames the R-candidate cap or the fusion
    weights — the recall stage is held fixed. ``ceiling_bp``: of the
    GLOBAL exact fused top-k (no index at all), how many are reachable
    at all? A shortfall here blames index geometry — the r13 loop in
    action: the single-bucket ceiling measured near ZERO on this
    structureless fixture, which motivated ``knn_lsh_multiprobe``, the
    pipeline adopted it, and this audit's reachability predicate tracks
    the pipeline's own probe rule (no rerank tuning can recover what
    the probes never fetch). Composes the REGISTERED rerank builder
    directly and splices its oracle text as a CTE, the
    ``knn_ivf_recall_audit`` no-drift pattern. All ratios are integer
    basis points over varying per-query reachable counts.

    Scale shape: the exact side is a broadcast nested-loop over the
    bounded query set (the same shape as ``knn_bruteforce_cosine`` —
    one corpus pass, no shuffle of the big side) with the pairwise
    lexical features computed only against the k x queries ground-truth
    rows' join partners; the audit joins are queries x k rows on both
    sides, broadcast. At 100 TB the exact side runs on a sampled query
    stratum — the standard offline-eval shape — and the pipeline side
    is unchanged.
    """
    from data_preparation_plugin_spark.functions.text import tokens as _toks

    emb = staged_vectors(spark, sf_dir).withColumn(
        "bucket", _bucket_col(F.col("v"))
    )
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_toks(F.col("text"))).alias("tk")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    qt = toks.select(
        F.col("doc_id").alias("query_id"), F.col("tk").alias("q_tk")
    )
    fused_all = (
        emb.join(
            F.broadcast(queries.join(qt, "query_id")),
            F.col("vec_id") != F.col("query_id"),
        )
        .join(toks, F.col("doc_id") == F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                sum(
                    (
                        F.substring("bucket", i, 1)
                        != F.substring("qbucket", i, 1)
                    ).cast("int")
                    for i in range(1, N_HYPERPLANES + 1)
                )
                <= 1
            ).alias("in_probed"),
            F.round(
                0.5 * F.round(paired_cosine(), 6)
                + 0.5
                * (
                    F.size(F.array_intersect("q_tk", "tk"))
                    * F.lit(1.0)
                    / F.size(F.array_union("q_tk", "tk"))
                ),
                6,
            ).alias("score6"),
        )
    )
    top_win = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), F.col("neighbor_id")
    )
    reachable_top = (
        fused_all.filter("in_probed")
        .withColumn("rn", F.row_number().over(top_win))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    global_top = (
        fused_all.withColumn("rn", F.row_number().over(top_win))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "in_probed")
    )
    pipeline = knn_rerank_crossfeatures(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    rerank_agg = (
        reachable_top.join(
            F.broadcast(pipeline), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reachable"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
    )
    ceiling_agg = global_top.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_global"),
        F.sum(F.col("in_probed").cast("int")).cast("long").alias("n_in_probed"),
    )
    return rerank_agg.join(ceiling_agg, "query_id").select(
        "query_id",
        "n_reachable",
        "n_hits",
        F.expr("n_hits * 10000 div n_reachable").alias("rerank_recall_bp"),
        "n_global",
        "n_in_probed",
        F.expr("n_in_probed * 10000 div n_global").alias("ceiling_bp"),
    )


@register(
    "knn_lsh_multiprobe",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_bucket_sql("embedding::DOUBLE[]")} AS bucket
        FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM e
        WHERE vec_id < {N_QUERY_VECS}
    ), probes AS (
        SELECT query_id, qv, qbucket AS pbucket FROM q
        {_PROBE_UNIONS_SQL}
    ), scored AS (
        SELECT query_id,
               e.vec_id AS neighbor_id,
               round(list_cosine_similarity(qv, e.v), 6) AS cosine6,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC,
                            e.vec_id) AS rn
        FROM probes p
        JOIN e ON e.bucket = p.pbucket AND e.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, round(cosine6, 4) AS cosine, rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: the query's bucket plus every Hamming-1
    neighbor bucket — the recall fix single-bucket LSH can't tune into.

    ``knn_rerank_recall_audit`` measures the single-bucket geometry's
    ceiling at near zero on the structureless fixture: true neighbors
    live in buckets that differ by one marginal hyperplane sign. The
    standard repair (Lv et al., multi-probe LSH) queries the hash
    CELLS MOST LIKELY to hold misses instead of adding index copies:
    each query generates {{1 + planes}} probe keys (its own bucket and
    all one-bit flips), and candidates are everything in those cells —
    ~9x the candidate volume with ZERO extra index state, vs 2^8
    buckets of corpus for brute force. Measured against the registered
    exact baseline at sf0.01: single-bucket recall@5 = 0/50, multi-probe
    = 6/50 — on a corpus built to have NO locality structure, i.e. the
    hardest case for any hash index.

    Scale shape: this is deliberately NOT a Hamming-distance theta join
    (which would be corpus x queries): the probe keys are GENERATED
    driver-free as a 9-element array per query and exploded, so the
    candidate fetch stays an EQUI-join on the bucket key — the identical
    shuffle/index layout as ``knn_lsh_cosine``, just 9 probe rows per
    query on the (tiny, broadcast) probe side. A candidate's single
    bucket matches at most one probe key, so no dedup stage is needed.
    Per-query cost scales with the probed cells' occupancy, never the
    corpus.
    """
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    return (
        _multiprobe_scored(spark, sf_dir)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


def ivf_index_dir(sf_dir: str, variant: str = "full") -> str:
    """Per-fixture directory for the persisted IVF index (md5-stable).

    The embeddings table's content fingerprint (size + mtime_ns) is part
    of the key, so regenerating fixture data at the same path gets a
    fresh cache directory instead of silently serving a stale index
    (r15 ADVICE). ``variant`` separates the full-corpus index from the
    admission-test base index (built minus the held-out batch).
    """
    import hashlib
    import os
    import tempfile

    from data_preparation_plugin_spark.plans.curation import (
        fixture_fingerprint,
    )

    key = f"{sf_dir}|{fixture_fingerprint(sf_dir, 'embeddings')}|{variant}"
    digest = hashlib.md5(key.encode("utf-8")).hexdigest()[:12]
    base = os.path.basename(os.path.normpath(sf_dir)) or "root"
    return os.path.join(
        tempfile.gettempdir(), "dpp-ivf-index", f"{base}-{digest}"
    )


def build_ivf_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Materialize the IVF index once: centroids + cell-partitioned lists.

    The similarity-family twin of ``curation.build_archive_indexes``
    (same r14 materialized-standing-state theme): the coarse codebook
    (``IVF_N_CELLS`` rows) and the corpus assignments — each vector with
    its cell id — are written as tables, the assignments laid out via
    ``layout.write_partitioned`` ON THE CELL so a query that probes 2 of
    8 cells reads 2/8 of the index bytes (directory partition pruning,
    the inverted-list property made physical). Cached per fixture behind
    ``_SUCCESS``; production refreshes by re-assigning only new vectors.
    """
    import contextlib
    import os

    from data_preparation_plugin_spark.layout import write_partitioned
    from data_preparation_plugin_spark.plans.curation import (
        cleanup_stale_cache_dirs,
        single_writer,
        write_cache_key,
    )

    base = ivf_index_dir(sf_dir)
    done = [
        os.path.join(base, part, "_SUCCESS")
        for part in ("centroids", "assignments")
    ]
    if not force and all(os.path.exists(p) for p in done):
        return base
    # Single-writer (r16 ADVICE): without the lock, two sessions that
    # both see missing markers race overwrite-writes into the same dir,
    # and a waiter could read centroids whose assignments are still
    # being written. Markers are removed before a rebuild so waiters
    # ENTERING here can never satisfy the all-markers check mid-write.
    # Scope: the guarantee covers build-time waiters, not a reader
    # whose lazy plan is mid-scan when another session force-rebuilds
    # the same dir in place — same-fixture force rebuilds are a
    # single-operator action (fixture REGENERATION gets a fresh epoch
    # dir via the content-fingerprint key and never collides).
    with single_writer(base, done, "IVF index") as acquired:
        if acquired and (force or not all(os.path.exists(p) for p in done)):
            for p in done:
                with contextlib.suppress(OSError):
                    os.unlink(p)
            cleanup_stale_cache_dirs(
                os.path.dirname(base), f"{sf_dir}|full", keep=base
            )
            write_cache_key(base, f"{sf_dir}|full")  # pre-write: r16 review
            emb = load_table(spark, sf_dir, "embeddings").select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            ).filter(nonzero_vec("v"))
            cents = emb.filter(F.col("vec_id") < IVF_N_CELLS).select(
                F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
            )
            cents.write.mode("overwrite").parquet(
                os.path.join(base, "centroids")
            )
            write_partitioned(
                _assign_to_codebook(emb, cents),
                os.path.join(base, "assignments"),
                ["cell"],
            )
    return base


def _assign_to_codebook(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, cell) — each vector's nearest-centroid cell, the
    codebook broadcast; per-vector, independent of every other vector,
    which is what makes incremental admission exact (an appended batch
    lands in the same cells a full rebuild would give it)."""
    if "nrm" not in emb.columns:
        emb = emb.withColumn("nrm", l2_norm(F.col("v")))
    if "cnrm" not in cents.columns:
        cents = cents.withColumn("cnrm", l2_norm(F.col("cv")))
    assign_win = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos", F.round(paired_cosine("v", "cv", "nrm", "cnrm"), 6)
        )
        .withColumn("crn", F.row_number().over(assign_win))
        .filter(F.col("crn") == 1)
        .select("vec_id", "v", F.col("cent_id").alias("cell"))
    )


@register(
    "knn_ivf_persisted",
    category="similarity",
    oracle=None,  # set below: identical answer to knn_ivf_cosine
)
def knn_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving against the PERSISTED index — pruned, never rebuilt.

    ``knn_ivf_cosine`` concedes its codebook/assignment pass runs per
    query ("swap in persisted trained centroids in production"); this is
    that production shape: ``build_ivf_index`` writes the codebook and
    the cell-PARTITIONED inverted lists once, and query time (1) reads
    the 8-row codebook, (2) picks each query's ``IVF_NPROBE`` cells
    broadcast-side, and (3) joins the probe set against the assignment
    table so Spark's dynamic partition pruning drops the un-probed cell
    directories from the scan (asserted in
    ``tests/test_plans.py::test_ivf_persisted_dpp``) — query cost tracks
    probed-list bytes, not corpus bytes, FAISS's inverted-list property
    expressed as table layout. The oracle is ``knn_ivf_cosine``'s
    verbatim: a persisted index changes where bytes are read, never the
    neighbors.

    Scale shape: nothing corpus-sized shuffles — the codebook and probe
    set are broadcast, the pruned scan streams only probed cells, and
    the top-k window partitions by query over candidate rows.
    """
    base = build_ivf_index(spark, sf_dir)
    return _ivf_serve(spark, sf_dir, base)


def _ivf_serve(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    """Query the persisted IVF index at ``base``: broadcast codebook +
    probe set, DPP-pruned scan of the probed cell partitions, per-query
    top-k window. Shared by the frozen-index and post-admission twins."""
    import os

    # The persisted index stores (vec_id, v, cell) only — norms are
    # recomputed ONCE per row on read (loop-invariant for the scoring
    # join), keeping the on-disk schema stable across this change.
    cents = spark.read.parquet(os.path.join(base, "centroids")).withColumn(
        "cnrm", l2_norm(F.col("cv"))
    )
    assigned = spark.read.parquet(
        os.path.join(base, "assignments")
    ).withColumn("nrm", l2_norm(F.col("v")))
    queries = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERY_VECS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("qnrm", l2_norm(F.col("qv")))
        .filter(nonzero_vec("qv"))
    )
    probe_win = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("cent_id")
    )
    probed = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn(
            "pcos", F.round(paired_cosine("qv", "cv", "qnrm", "cnrm"), 6)
        )
        .withColumn("prn", F.row_number().over(probe_win))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", "qv", "qnrm", F.col("cent_id").alias("qcell"))
    )
    scored = (
        assigned.join(F.broadcast(probed), F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine6", F.round(paired_cosine(), 6))
    )
    topk_win = Window.partitionBy("query_id").orderBy(
        F.col("cosine6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(topk_win))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine6", 4).alias("cosine"),
            "rn",
        )
    )


# The persisted twin must answer EXACTLY like the per-query-rebuild
# form — same oracle text, same no-drift discipline as
# curation_incremental_ingest_indexed.
from data_preparation_plugin_spark.plans.registry import QUERIES as _Q

_Q["knn_ivf_persisted"].oracle = _Q["knn_ivf_cosine"].oracle


#: Admission-batch split for the incremental-ANN query: TWO held-out
#: crawl batches, vec_id % MOD == residue for each residue in turn —
#: the registered query admits both sequentially, so the steady state
#: of REPEATED appends (not a single lucky one) is what the oracle
#: checks. Every residue >= IVF_N_CELLS guarantees no centroid vector
#: is held out, so the base index's codebook is byte-identical to the
#: full build's.
IVF_ADMIT_MOD = 10
IVF_ADMIT_RESIDUES = (8, 9)

#: Cell-size skew (max/mean) beyond which the drift guard demands a
#: codebook re-train instead of further appends.
IVF_SKEW_RETRAIN_RATIO = 4.0


def build_ivf_base_index(
    spark: SparkSession,
    sf_dir: str,
    force: bool = False,
    variant: str | None = None,
) -> str:
    """The IVF index over the corpus MINUS the admission batch.

    Same layout as :func:`build_ivf_index` (codebook + cell-partitioned
    assignments) built minus EVERY admission residue
    (``vec_id % IVF_ADMIT_MOD not in IVF_ADMIT_RESIDUES``) — the
    standing state a production index is in before the crawl batches
    arrive. ``force=True`` rebuilds and clears the admission markers
    (and any crash-recovery manifests). ``variant`` overrides the cache
    dir name so independent lifecycles (the steady-state admission
    query vs the retrain drill) never invalidate each other's caches.
    """
    import contextlib
    import os

    from data_preparation_plugin_spark.layout import write_partitioned
    from data_preparation_plugin_spark.plans.curation import (
        cleanup_stale_cache_dirs,
        single_writer,
        write_cache_key,
    )

    if variant is None:
        variant = "base-" + "-".join(map(str, IVF_ADMIT_RESIDUES))
    base = ivf_index_dir(sf_dir, variant=variant)
    done = [
        os.path.join(base, part, "_SUCCESS")
        for part in ("centroids", "assignments")
    ]
    if not force and all(os.path.exists(p) for p in done):
        return base
    # Single-writer (r16 ADVICE — the entry-point builder raced like the
    # appends did pre-r15): rebuilds clear the part markers first so a
    # waiter entering the lock path can never read centroids paired
    # with half-written assignments, then retire every admission
    # artifact (markers AND crash-recovery manifests) so the rebuilt
    # index starts un-admitted. Same scope note as build_ivf_index:
    # in-place force rebuilds assume no concurrent reader of the SAME
    # dir (the drill's dedicated `variant` isolates it from the
    # steady-state queries; concurrent bench/probe processes are a
    # measurement-hygiene violation regardless).
    with single_writer(base, done, "IVF base index") as acquired:
        if acquired and (force or not all(os.path.exists(p) for p in done)):
            for p in done:
                with contextlib.suppress(OSError):
                    os.unlink(p)
            for r in IVF_ADMIT_RESIDUES:
                for stale in (f"_ADMITTED_r{r}", f"_PRE_ADMIT_r{r}.json"):
                    with contextlib.suppress(OSError):
                        os.unlink(os.path.join(base, stale))
            cleanup_stale_cache_dirs(
                os.path.dirname(base), f"{sf_dir}|{variant}", keep=base
            )
            write_cache_key(base, f"{sf_dir}|{variant}")  # pre-write
            emb = (
                load_table(spark, sf_dir, "embeddings")
                .filter(
                    ~(F.col("vec_id") % IVF_ADMIT_MOD).isin(
                        *IVF_ADMIT_RESIDUES
                    )
                )
                .select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("v"),
                )
                .filter(nonzero_vec("v"))
            )
            cents = emb.filter(F.col("vec_id") < IVF_N_CELLS).select(
                F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
            )
            cents.write.mode("overwrite").parquet(
                os.path.join(base, "centroids")
            )
            write_partitioned(
                _assign_to_codebook(emb, cents),
                os.path.join(base, "assignments"),
                ["cell"],
            )
    return base


def admit_ivf_batch(
    spark: SparkSession, sf_dir: str, base: str, residue: int
) -> None:
    """APPEND one admission batch into its assigned cell partitions.

    The incremental-ANN lifecycle step (r14 verdict item 3): the batch
    (``vec_id % IVF_ADMIT_MOD == residue``) is assigned with
    the PERSISTED codebook — never re-trained — and appended directly
    into the standing ``assignments/cell=N/`` directories via
    ``layout.write_partitioned(mode="append")``; cost is
    batch-proportional (one broadcast pass over the batch, new part
    files only in the batch's cells). Exactness: assignment is
    per-vector against a frozen codebook, so append ≡ full rebuild —
    the registered query's oracle (full-corpus ``knn_ivf_cosine``)
    checks exactly that.

    Locked and idempotent PER BATCH like ``curation.write_cycle_delta``
    (marker ``_ADMITTED_r<residue>``): one writer appends, concurrent
    callers wait, completed admissions never re-append (a double append
    would duplicate candidates). Idempotent on the CRASH path too (r16
    ADVICE): before appending, the writer snapshots the standing
    ``assignments/`` file list to ``_PRE_ADMIT_r<residue>.json``; a
    retry that finds the snapshot with no ``_ADMITTED`` marker knows a
    prior writer died mid-append and deletes every assignment file not
    in the snapshot — partially job-committed part files can no longer
    masquerade as base files and be double-appended. The admission lock
    is index-global (``.admit.lock``), taken in a retry loop, so two
    different residues can never interleave appends and corrupt each
    other's snapshots. After admitting, check :func:`ivf_cell_skew` —
    repeated appends drift cell sizes, and past
    ``IVF_SKEW_RETRAIN_RATIO`` the answer is a re-train
    (``build_ivf_base_index(force=True)``), not another append.
    """
    import json
    import os
    import time

    from data_preparation_plugin_spark.layout import write_partitioned
    from data_preparation_plugin_spark.plans import curation

    marker = os.path.join(base, f"_ADMITTED_r{residue}")
    if os.path.exists(marker):
        return
    adir = os.path.join(base, "assignments")

    def _listing() -> list:
        out = []
        for root, _dirs, files in os.walk(adir):
            for fn in files:
                out.append(
                    os.path.relpath(os.path.join(root, fn), adir)
                )
        return sorted(out)

    lock = os.path.join(base, ".admit.lock")
    deadline = time.monotonic() + curation.WRITER_LOCK_TIMEOUT_S
    while True:
        if os.path.exists(marker):
            return
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"IVF admit lock {lock} held "
                    f">{curation.WRITER_LOCK_TIMEOUT_S}s with no "
                    f"_ADMITTED_r{residue} marker. A legitimately slow "
                    "admission of ANOTHER residue also holds this "
                    "index-global lock — VERIFY the writing session is "
                    "dead, then remove the lockfile to retry "
                    "(removing a live writer's lock interleaves "
                    "appends); otherwise raise WRITER_LOCK_TIMEOUT_S"
                )
            time.sleep(0.2)
    try:
        if os.path.exists(marker):  # re-check under the lock
            return
        pre = os.path.join(base, f"_PRE_ADMIT_r{residue}.json")
        if os.path.exists(pre):
            # A prior writer crashed mid-append: anything not in its
            # pre-append snapshot is a partial append — remove it so
            # this retry appends the batch exactly once.
            with open(pre) as f:
                keep = set(json.load(f))
            for rel in _listing():
                if rel not in keep:
                    os.unlink(os.path.join(adir, rel))
        else:
            with open(pre + ".tmp", "w") as f:
                json.dump(_listing(), f)
            os.replace(pre + ".tmp", pre)
        batch = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % IVF_ADMIT_MOD == residue)
            .select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            )
            .filter(nonzero_vec("v"))
        )
        cents = spark.read.parquet(os.path.join(base, "centroids"))
        write_partitioned(
            _assign_to_codebook(batch, cents),
            adir,
            ["cell"],
            mode="append",
        )
        with open(marker, "w"):
            pass
        os.unlink(pre)
    finally:
        os.close(fd)
        os.unlink(lock)


def ivf_cell_skew(spark: SparkSession, base: str) -> dict:
    """Drift guard: cell-size skew of the persisted inverted lists.

    Returns max/mean cell sizes and ``retrain=True`` once the ratio
    passes ``IVF_SKEW_RETRAIN_RATIO`` — the signal that admissions have
    drifted the data distribution away from the frozen codebook and
    probe cost is no longer balanced. One bounded aggregate: at most
    ``IVF_N_CELLS`` rows leave the scan.
    """
    import os

    sizes = (
        spark.read.parquet(os.path.join(base, "assignments"))
        .groupBy("cell")
        .count()
    )
    row = sizes.agg(
        F.max("count").alias("mx"), F.avg("count").alias("mean")
    ).collect()[0]
    skew = float(row["mx"]) / float(row["mean"])
    return {
        "max_cell": int(row["mx"]),
        "mean_cell": float(row["mean"]),
        "skew": round(skew, 4),
        "retrain": skew > IVF_SKEW_RETRAIN_RATIO,
    }


@register(
    "knn_ivf_admitted",
    category="similarity",
    oracle=None,  # set below: identical answer to knn_ivf_cosine
)
def knn_ivf_admitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving AFTER an incremental admission — index grew, not rebuilt.

    The ANN twin of ``curation_two_cycle_ingest``'s lifecycle closure:
    ``build_ivf_base_index`` stands up the index minus TWO crawl
    batches, :func:`admit_ivf_batch` appends each batch's assignments
    in turn — two sequential admission cycles, each locked and
    idempotent, the REPEATED-append steady state rather than a single
    lucky one — and serving is ``knn_ivf_persisted``'s verbatim plan
    over the grown index —
    dynamic partition pruning still drops un-probed cell directories
    (same plan assertion), and the top-k now includes admitted vectors.

    Oracle: the full-corpus ``knn_ivf_cosine`` text — if the append
    dropped, duplicated, or mis-assigned a single admitted vector, the
    neighbor lists diverge and the hash fails. Exactness rests on
    assignment being per-vector against the frozen codebook
    (``_assign_to_codebook``), so append ≡ rebuild; the residue choice
    keeps every centroid id out of the batch so base and full codebooks
    coincide. Drift: production alternates appends with
    :func:`ivf_cell_skew` checks and re-trains past
    ``IVF_SKEW_RETRAIN_RATIO`` — frozen-codebook appends are exact for
    the index they grow, but probe balance decays as the distribution
    moves.
    """
    base = build_ivf_base_index(spark, sf_dir)
    for residue in IVF_ADMIT_RESIDUES:
        admit_ivf_batch(spark, sf_dir, base, residue)
    return _ivf_serve(spark, sf_dir, base)


_Q["knn_ivf_admitted"].oracle = _Q["knn_ivf_cosine"].oracle


def ivf_admit_with_drift_guard(
    spark: SparkSession,
    sf_dir: str,
    retrain_ratio: float | None = None,
    variant: str | None = None,
) -> tuple:
    """Admission with the drift guard IN the loop: append, check, retrain.

    The production admission protocol ``admit_ivf_batch``'s docstring
    narrates, made a callable step: admit every crawl batch against the
    standing codebook, measure :func:`ivf_cell_skew`, and when the skew
    passes ``retrain_ratio`` (default ``IVF_SKEW_RETRAIN_RATIO``) rebuild
    the codebook (``build_ivf_base_index(force=True)`` — which also
    retires the admission markers and crash manifests) and re-admit the
    batches against the fresh codebook. Returns
    ``(base, retrained, guard)`` where ``guard`` is the final
    :func:`ivf_cell_skew` report.

    Exactness across the retrain: assignment is per-vector against
    whatever codebook is standing, so serve-after-retrain must equal the
    full-corpus build — ``knn_ivf_retrain_drill``'s oracle and
    ``tests/test_plans.py::test_ivf_drift_guard_retrain_end_to_end``
    (which drives a genuinely skewed fixture past the PRODUCTION ratio)
    both pin it.
    """
    ratio = IVF_SKEW_RETRAIN_RATIO if retrain_ratio is None else retrain_ratio
    base = build_ivf_base_index(spark, sf_dir, variant=variant)
    for residue in IVF_ADMIT_RESIDUES:
        admit_ivf_batch(spark, sf_dir, base, residue)
    guard = ivf_cell_skew(spark, base)
    retrained = guard["skew"] > ratio
    if retrained:
        base = build_ivf_base_index(
            spark, sf_dir, force=True, variant=variant
        )
        for residue in IVF_ADMIT_RESIDUES:
            admit_ivf_batch(spark, sf_dir, base, residue)
        guard = ivf_cell_skew(spark, base)
    return base, retrained, guard


@register(
    "ivf_admission_drift_guard",
    category="similarity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {NONZERO_VEC_SQL}
    ), cents AS (
        SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {IVF_N_CELLS}
    ), assigned AS (
        SELECT vec_id, cent_id AS cell FROM (
            SELECT e.vec_id, cents.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, cv), 6) DESC,
                                cent_id) AS crn
            FROM e CROSS JOIN cents
        ) WHERE crn = 1
    ), sizes AS (
        SELECT cell, count(*) AS n FROM assigned GROUP BY cell
    )
    SELECT CAST(max(n) AS BIGINT) AS max_cell,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(n) AS BIGINT) AS total_vecs,
           CAST(max(n) * count(*) > {IVF_SKEW_RETRAIN_RATIO} * sum(n)
                AS INT) AS retrain
    FROM sizes
    """,
)
def ivf_admission_drift_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift guard's verdict on the POST-ADMISSION index, audited.

    ``ivf_cell_skew`` was a Python-side helper tested only on synthetic
    fixtures (r15 verdict item 3); this registers its decision as an
    oracle-checked query: stand up the base index, admit both crawl
    batches (the same persisted lifecycle as ``knn_ivf_admitted``),
    then report the inverted-list balance from the PERSISTED cell
    partitions — max cell size, cell count, total vectors, and the
    retrain verdict. The flag is computed in exact integer arithmetic
    (``max * n_cells > ratio * total``, algebraically identical to
    ``max/mean > ratio``) so both engines decide identically — no
    float-division rounding in the output.

    Oracle: recomputes the full-corpus nearest-centroid assignment from
    first principles (base ∪ admitted ≡ full corpus by construction)
    and the same balance stats — a dropped, duplicated, or mis-assigned
    admission changes ``total_vecs``/``max_cell`` and hash-fails.

    Scale shape: one scan of the persisted assignment table (cell sizes
    could equally come from parquet partition metadata), one
    ``IVF_N_CELLS``-row aggregate. The guard is what makes frozen-
    codebook appends SAFE at 100 TB: appends are exact for the index
    they grow, and this is the bounded, recurring check that decides
    when probe balance has drifted enough to pay for a re-train.
    """
    import os

    base = build_ivf_base_index(spark, sf_dir)
    for residue in IVF_ADMIT_RESIDUES:
        admit_ivf_batch(spark, sf_dir, base, residue)
    sizes = (
        spark.read.parquet(os.path.join(base, "assignments"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return sizes.agg(
        F.max("n").cast("bigint").alias("max_cell"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("total_vecs"),
    ).withColumn(
        "retrain",
        (
            (F.col("max_cell") * F.col("n_cells"))
            > (F.lit(IVF_SKEW_RETRAIN_RATIO) * F.col("total_vecs"))
        ).cast("int"),
    )


@register(
    "knn_ivf_retrain_drill",
    category="similarity",
    oracle=None,  # set below: identical answer to knn_ivf_cosine
    scale_note=(
        "a retrain drill is corpus-proportional by definition: the "
        "forced branch rebuilds the codebook+assignments and re-admits "
        "both batches every run, so cost tracks corpus bytes — the "
        "amortization story is the guard's ratio gate, not this row"
    ),
)
def knn_ivf_retrain_drill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guard→retrain→re-admit→serve, end-to-end, every run — the drill.

    The r15 verdict's missing lifecycle arc ("the guard's retrain=True
    is signaled, never exercised"): this query runs
    :func:`ivf_admit_with_drift_guard` with ``retrain_ratio=0.0`` so the
    retrain branch ALWAYS fires — a fire drill, deliberately: admissions
    land, the guard reads the persisted cells, the codebook is rebuilt
    (``force=True`` clears admission markers and crash manifests), both
    crawl batches re-admit against the fresh codebook, and serving runs
    over the retrained index. Production gates the same branch at
    ``IVF_SKEW_RETRAIN_RATIO``;
    ``tests/test_plans.py::test_ivf_drift_guard_retrain_end_to_end``
    drives that PRODUCTION threshold past 4.0 with genuinely skewed
    admissions and pins the identical equality. A separate cache
    ``variant`` keeps the drill's force-rebuilds from thrashing
    ``knn_ivf_admitted``'s steady-state index.

    Oracle: full-corpus ``knn_ivf_cosine`` verbatim — retrain + re-
    admission must be answer-invisible (the deterministic codebook is
    distribution-independent here; with trained centroids the guarantee
    becomes recall-preservation, checked by ``knn_recall_audit``'s
    machinery instead).
    """
    base, retrained, _guard = ivf_admit_with_drift_guard(
        spark, sf_dir, retrain_ratio=0.0, variant="drill-base"
    )
    assert retrained, "drill ratio 0.0 must force the retrain branch"
    return _ivf_serve(spark, sf_dir, base)


_Q["knn_ivf_retrain_drill"].oracle = _Q["knn_ivf_cosine"].oracle
