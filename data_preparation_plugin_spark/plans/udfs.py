"""Python UDF surface: grouped-map ``applyInPandas`` and GROUPED_AGG.

The reference's canonical transform step is arbitrary user pandas over a
whole table (README.md:48-83). At scale that becomes *grouped* pandas:
Spark ships each group to a Python worker as one Arrow batch and the user
function stays plain pandas. These queries exercise that surface with
semantics chosen to be bit-exact across engines (median of 2-decimal
values is either a data value or a midpoint of two — exact in binary;
min/max span is exact subtraction), so the Python path is hash-checked
against the DuckDB oracle like any built-in.

Scale notes: grouped-map materializes one group per Python worker call —
correct only when single-group size is bounded (here: group count is tiny
and bounded, the classic per-segment/per-priority shape). For unbounded
groups the engine's built-in aggregates or window functions are the right
tool; these UDF paths are the escape hatch the reference's users had in
pandas, not the default.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_preparation_plugin_spark.plans.registry import load_table, register


@register(
    "udf_grouped_map_median",
    category="udf",
    oracle="""
    SELECT c_mktsegment,
           median(c_acctbal) AS median_balance,
           count(*)          AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udf_grouped_map_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-segment median through pandas.

    One Arrow round trip per group; the median (numpy linear
    interpolation at the midpoint) is exact for 2-decimal inputs, so this
    Python-side computation hash-matches DuckDB's ``median``.
    """
    customer = load_table(spark, sf_dir, "customer")

    def seg_median(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "median_balance": [pdf["c_acctbal"].median()],
                "n_customers": [len(pdf)],
            }
        )

    return customer.select("c_mktsegment", "c_acctbal").groupBy(
        "c_mktsegment"
    ).applyInPandas(
        seg_median,
        schema="c_mktsegment string, median_balance double, n_customers long",
    )


@register(
    "udf_grouped_agg_span",
    category="udf",
    oracle="""
    SELECT o_orderpriority,
           max(o_totalprice) - min(o_totalprice) AS price_span,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udf_grouped_agg_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG ``pandas_udf``: a custom aggregate inside ``agg(...)``.

    Unlike grouped-map, a grouped-agg UDF slots into ``agg(...)`` and
    Spark still hash-partitions per key — the Python function only ever
    sees one group's column. Spark refuses to mix pandas and non-pandas
    aggregates in one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT), so the row
    count is a pandas UDF too. Span (max - min) is exact, hence
    oracle-checkable.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def span(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        span("o_totalprice").alias("price_span"),
        n_rows("o_totalprice").alias("n_orders"),
    )


@register(
    "udf_map_in_arrow",
    category="udf",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)
               AS n_vowels
    FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy Python UDF surface, hash-checked.

    One tier below the pandas UDFs: record batches arrive as raw
    ``pyarrow.RecordBatch`` and the computation runs in Arrow compute
    kernels (C++, SIMD) — no pandas conversion at all, the cheapest way
    through Python that exists. Used here for per-document character and
    vowel counts, reproduced by the oracle in SQL, so the Arrow path gets
    the same hard value check as every built-in. At scale this is the
    shape for custom vectorizable kernels (tokenizers, codecs) that ship
    as Arrow UDFs; anything expressible as ``pyspark.sql.functions``
    should still prefer the JVM (see LEAKCHECK discipline: no benched
    query runs Python).
    """
    from collections.abc import Iterator

    import pyarrow as pa

    def counts(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.count_substring_regex(text, "[aeiou]"), pa.int64()
                    ),
                ],
                names=["doc_id", "n_chars", "n_vowels"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        counts, schema="doc_id long, n_chars long, n_vowels long"
    )


@register(
    "udf_cogroup_views_before_purchase",
    category="udf",
    oracle="""
    SELECT p.user_id,
           p.event_id,
           CAST(coalesce(sum(CASE WHEN v.ts < p.ts THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_views_before
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'view') v
      ON p.user_id = v.user_id
    GROUP BY p.user_id, p.event_id
    """,
)
def udf_cogroup_views_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cogrouped ``applyInPandas``: two tables meet per key in one pandas call.

    The remaining grouped-Python surface: ``groupBy(k).cogroup(other
    .groupBy(k)).applyInPandas(fn)`` hands BOTH sides' rows for one key to
    a single pandas function — the API for custom per-entity merges
    (``pd.merge_asof`` with business rules, per-user sessionized
    attribution...) that no built-in join expresses. Here each purchase is
    attributed the count of that user's strictly-earlier views, computed
    with a sorted ``searchsorted`` per user — O(n log n) per group in
    Python versus the oracle's O(views x purchases) correlated join.

    Scale shape: one hash shuffle of each side on ``user_id`` (Arrow
    batches into Python, partition-parallel); per-group state is one
    user's events, bounded. The relational alternative (range join or
    windowed union) is preferred when semantics allow — this query exists
    to prove the escape hatch end-to-end, hash-checked like any built-in.
    """
    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )

    def attribute(views_pdf: pd.DataFrame, purch_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if purch_pdf.empty:
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "n_views_before": []}
            ).astype({"user_id": "int64", "event_id": "int64",
                      "n_views_before": "int64"})
        vts = np.sort(views_pdf["ts"].to_numpy())
        n_before = np.searchsorted(
            vts, purch_pdf["ts"].to_numpy(), side="left"
        )
        return pd.DataFrame(
            {
                "user_id": purch_pdf["user_id"].to_numpy(),
                "event_id": purch_pdf["event_id"].to_numpy(),
                "n_views_before": n_before.astype("int64"),
            }
        )

    # Pin the cogroup's width: the two key exchanges are tiny in BYTES,
    # so AQE coalesces them to ONE partition and every per-user pandas
    # invocation (the real cost — ~0.7 ms of Arrow protocol per group)
    # runs serially on one core (measured: the whole 4.0s of executor
    # time in a single task). An explicit REPARTITION_BY_NUM on the
    # grouping key satisfies the cogroup's distribution requirement —
    # same exchange count, AQE just may not collapse it — and spreads
    # the group invocations across the live parallelism.
    n = spark.sparkContext.defaultParallelism
    return (
        views.repartition(n, "user_id")
        .groupBy("user_id")
        .cogroup(purchases.repartition(n, "user_id").groupBy("user_id"))
        .applyInPandas(
            attribute,
            schema="user_id bigint, event_id bigint, n_views_before bigint",
        )
    )


@register(
    "udtf_word_chunks",
    category="udf",
    oracle=r"""
    WITH raw AS (
        SELECT doc_id,
               unnest(string_split_regex(text, '\s+')) AS w,
               generate_subscripts(
                   string_split_regex(text, '\s+'), 1) AS idx
        FROM documents
    ), words AS (
        -- Python str.split() semantics on every input: regex split
        -- yields '' elements for empty/whitespace-only text and at a
        -- leading separator; drop them and renumber, or empty docs
        -- manufacture a phantom chunk (r16 edge-fixture drive).
        SELECT doc_id, w,
               row_number() OVER (PARTITION BY doc_id ORDER BY idx)
                   AS widx
        FROM raw WHERE w <> ''
    )
    SELECT doc_id,
           CAST((widx - 1) // 5 AS INTEGER)      AS chunk_idx,
           string_agg(w, ' ' ORDER BY widx)      AS chunk,
           CAST(count(*) AS INTEGER)             AS n_words
    FROM words
    GROUP BY doc_id, (widx - 1) // 5
    """,
)
def udtf_word_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) in a LATERAL join: doc -> word-chunk rows.

    The user-defined TABLE function surface: one input row fans out to
    N output rows from arbitrary Python — the API for parsers,
    tokenizers, and decoders whose fan-out logic doesn't fit a scalar
    UDF. Here each document explodes into fixed 5-word chunks (every
    document yields multiple rows, so the fan-out path is genuinely
    exercised); the chunking rule is deliberately SQL-reproducible so
    the DuckDB oracle verifies the UDTF *plumbing* — registration,
    LATERAL correlation, per-row iteration, schema projection —
    value-for-value.

    Scale shape: a UDTF in a lateral join is partition-local — each
    task streams its rows through the Python worker, no shuffle is
    introduced, and fan-out is bounded by document length. For
    codegen-expressible chunking prefer ``posexplode`` over array
    slices (pure JVM, as ``text_chunk_sliding`` does); the UDTF is the
    escape hatch for logic that genuinely needs Python, and this query
    pins that the escape hatch works end-to-end.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_words int")
    class WordChunks:
        def eval(self, text: str):
            if text is None:
                return
            words = text.split()
            for i in range(0, len(words), 5):
                piece = words[i : i + 5]
                yield i // 5, " ".join(piece), len(piece)

    spark.udtf.register("dpp_word_chunks", WordChunks)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("__udtf_chunk_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.chunk_idx, s.chunk, s.n_words
        FROM __udtf_chunk_docs d,
             LATERAL dpp_word_chunks(d.text) s
        """
    )


@register(
    "udf_apply_in_arrow_regression",
    category="udf",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag,
               CAST(year(l_shipdate) AS BIGINT)         AS ship_year,
               CAST(l_quantity AS HUGEINT)              AS xq,
               CAST(round(l_extendedprice * 100) AS HUGEINT) AS yc
        FROM lineitem
    ), sums AS (
        SELECT l_returnflag, ship_year,
               CAST(count(*) AS HUGEINT) AS n,
               sum(xq)       AS sx,
               sum(yc)       AS sy,
               sum(xq * xq)  AS sxx,
               sum(xq * yc)  AS sxy
        FROM pts GROUP BY l_returnflag, ship_year
    )
    SELECT l_returnflag, ship_year,
           CAST(n AS BIGINT) AS n_rows,
           CAST((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx) AS BIGINT) AS slope_cents_e6
    FROM sums
    """,
)
def udf_apply_in_arrow_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group OLS slope via ``applyInArrow`` — the Arrow-native
    grouped-map API (Spark 4), completing the UDF surface next to the
    pandas grouped-map/agg, cogroup, ``mapInArrow`` and UDTF queries.

    The callback receives each group as a ``pyarrow.Table`` (zero pandas
    conversion) and computes the least-squares slope of extended price
    (cents) over quantity from the four classic sums. All sums are
    EXACT: quantities are integral and cent prices round exactly (2dp doubles), accumulated by Arrow
    as int64 and widened to Python ints for the final cross products
    (which overflow int64), mirrored by HUGEINT arithmetic in the
    oracle; the slope is fixed-point e6 via floor division, so the
    driver hash is integer-exact — no float summation-order hazard.

    Scale shape: grouped-map shuffles once on the (flag, ship-year)
    key — ~21 groups, so the Arrow stage parallelizes across tasks
    instead of serializing three giant groups — and each group reduces
    inside the callback to a single output row. Grouped-map parallelism
    IS the group count: for low-cardinality keys prefer built-in
    aggregates (these sums are all expressible as such — the preferred
    path); this pins the Arrow grouped-map escape hatch end-to-end.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def slope(table: pa.Table) -> pa.Table:
        xq = pc.cast(table.column("xq"), pa.int64())
        yc = pc.cast(table.column("yc"), pa.int64())
        n = table.num_rows
        sx = pc.sum(xq).as_py()
        sy = pc.sum(yc).as_py()
        sxx = pc.sum(pc.multiply_checked(xq, xq)).as_py()
        # x*y fits int64 per element (<= 50 * 1e8); the cross products
        # of the SUMS do not — finish in Python ints (arbitrary
        # precision), exactly like the oracle's HUGEINT.
        sxy = pc.sum(pc.multiply_checked(xq, yc)).as_py()
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        # DuckDB's // truncates toward zero; Python's floors. Truncate
        # explicitly so negative slopes agree.
        slope_e6 = (abs(num) * 1_000_000 // den) * (1 if num >= 0 else -1)
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "ship_year": pa.array(
                    [table.column("ship_year")[0].as_py()], pa.int64()
                ),
                "n_rows": pa.array([n], pa.int64()),
                "slope_cents_e6": pa.array([slope_e6], pa.int64()),
            }
        )

    pts = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.col("l_quantity").cast("long").alias("xq"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("yc"),
    )
    return pts.groupBy("l_returnflag", "ship_year").applyInArrow(
        slope,
        schema=(
            "l_returnflag string, ship_year long, "
            "n_rows long, slope_cents_e6 long"
        ),
    )


#: Substring lexicon and integer weights for the iterator-UDF scorer —
#: module-level so builder and oracle derive from the same literal.
SCALAR_ITER_LEXICON = (("data", 3), ("query", 2), ("stream", 5))


@register(
    "udf_scalar_iter_score",
    category="udf",
    oracle=f"""
    SELECT doc_id,
           CAST({" + ".join(
               f"{w} * ((length(text) - length(replace(text, '{kw}', '')))"
               f" // {len(kw)})"
               for kw, w in SCALAR_ITER_LEXICON
           )} + length(text) // 100 AS BIGINT) AS score
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def udf_scalar_iter_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF — amortized per-worker model load.

    The serving shape of every learned quality filter at 100 TB: the
    scorer (a fasttext model, an ONNX session, a tokenizer) is
    expensive to CONSTRUCT and cheap to APPLY, so loading it per row —
    or even per batch — dominates.  ``SCALAR_ITER`` is the pandas-UDF
    variant built for exactly this: the function receives the WHOLE
    iterator of Arrow batches for a partition, so the model loads once
    per task and streams every batch (the other UDF surfaces here —
    scalar, grouped-map, cogroup, mapInArrow — cannot express
    "initialize once, then iterate").  The stand-in model is a
    deterministic substring-weight lexicon built before the batch
    loop; scoring is integer (weighted substring occurrences + a
    length prior), so the oracle replays it exactly with
    length/replace arithmetic.

    Scale shape: embarrassingly parallel map over Arrow batches, zero
    shuffle, zero joins; the 10-per-batch Arrow size is configured by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` in production,
    and per-task init cost amortizes over all of them.
    """
    from pyspark.sql.functions import pandas_udf

    lexicon = SCALAR_ITER_LEXICON

    @pandas_udf("long")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # "Model load": runs once per task, not once per batch/row.
        model = [(kw, w) for kw, w in lexicon]
        for texts in batches:
            total = texts.str.len() // 100
            for kw, w in model:
                total = total + w * texts.str.count(kw, flags=0)
            yield total.astype("int64")

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    return docs.select(
        "doc_id", score(F.col("text")).cast("bigint").alias("score")
    )


@register(
    "udtf_arrow_ngram_stats",
    category="udf",
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
               generate_subscripts(
                   string_split_regex(trim(lower(text)), '\s+'), 1) AS idx
        FROM documents
        WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
           CAST(max(length(w)) AS BIGINT) AS max_token_len,
           min(w) AS first_token_alpha
    FROM words
    GROUP BY doc_id
    """,
)
def udtf_arrow_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-optimized Python UDTF (``useArrow=True``) in a LATERAL join.

    The second half of the UDTF surface: ``udtf_word_chunks`` proved
    the row-based table function; Spark 4 can also run UDTFs over
    Arrow batches, removing the per-row pickle round trip — the same
    ~10-100× transport gap as scalar UDFs vs pandas UDFs, now for
    table functions.  The function itself computes per-document token
    stats (count, distinct, longest token, alphabetic min) in plain
    Python over the split — deterministic, so the DuckDB aggregate
    replays it exactly.  The point under test is the ARROW TRANSPORT
    of the lateral expansion, value-checked end to end.

    Scale shape: partition-local lateral apply, zero shuffle; the
    UDTF emits one row per input document, so the expansion is
    bounded by construction.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "n_tokens BIGINT, n_distinct BIGINT,"
            " max_token_len BIGINT, first_token_alpha STRING"
        ),
        useArrow=True,
    )
    class NgramStats:
        def eval(self, text: str):
            toks = text.strip().lower().split()
            if toks:
                yield (
                    len(toks),
                    len(set(toks)),
                    max(len(t) for t in toks),
                    min(toks),
                )

    spark.udtf.register("__ngram_stats", NgramStats)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    )
    docs.createOrReplaceTempView("__arrow_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.n_tokens, s.n_distinct,
               s.max_token_len, s.first_token_alpha
        FROM __arrow_udtf_docs d,
             LATERAL __ngram_stats(d.text) s
        """
    )
