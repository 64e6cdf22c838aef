"""Property-based tests (hypothesis) for schema helpers and text functions.

The reference's suite is golden-output only (SURVEY.md §5: "no
property-based/randomized testing"); these cover the algebraic contracts
randomized inputs actually stress — schema merging, shingle construction —
with a pure-Python reference model for the Spark column expressions.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# Derandomized: a CI/driver run must never fail on a fresh random example
# that local runs never saw; edge-case hunting happens locally.
settings.register_profile("ci", derandomize=True)
settings.load_profile("ci")

from pyspark.sql.types import LongType, StringType, StructField, StructType

from data_preparation_plugin_spark.dataset import merge_dtype, row2dict
from data_preparation_plugin_spark.functions.text import exploded_shingles

names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=122),
    min_size=1,
    max_size=8,
)


def _schema(field_names):
    return StructType([StructField(n, StringType()) for n in field_names])


@given(st.lists(names, max_size=8), st.lists(names, max_size=8))
def test_merge_dtype_first_wins_and_order_preserved(a, b):
    merged = merge_dtype(_schema(a), _schema(b))
    out = [f.name for f in merged.fields]
    # Every name appears exactly once, in first-occurrence order.
    expected = list(dict.fromkeys(a + b))
    assert out == expected


@given(st.lists(names, min_size=1, max_size=8))
def test_merge_dtype_idempotent(a):
    s = _schema(a)
    once = merge_dtype(s)
    twice = merge_dtype(once, once)
    assert twice == once


def test_merge_dtype_keeps_first_type_on_conflict():
    a = StructType([StructField("id", LongType())])
    b = StructType([StructField("id", StringType())])
    assert merge_dtype(a, b)["id"].dataType == LongType()


def _reference_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Pure-Python model of functions.text shingling semantics."""
    if len(tokens) >= k:
        return [
            " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
        ]
    return [" ".join(tokens)]


words = st.text(alphabet="abcdef", min_size=1, max_size=5)
docs_strategy = st.lists(  # corpus: list of token-lists
    st.lists(words, min_size=0, max_size=12), min_size=1, max_size=20
)


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_exploded_shingles_matches_reference(spark, corpus):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got: dict[int, list[str]] = {i: [] for i, _ in rows}
    for r in exploded_shingles(df, ["doc_id"], "text").collect():
        got[r.doc_id].append(r.shingle)
    for i, toks in enumerate(corpus):
        # Spark's split on r"\s+" of "" yields [""]; the reference model
        # sees the same via " ".join([]) == "".
        expected = _reference_shingles([t for t in " ".join(toks).split(" ")])
        assert sorted(got[i]) == sorted(expected), (i, toks)


def test_row2dict_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", [])],
        "id LONG, name STRING, vec ARRAY<DOUBLE>",
    )
    dicts = [row2dict(r) for r in df.collect()]
    assert dicts == [
        {"id": 1, "name": "a", "vec": [1.0, 2.0]},
        {"id": 2, "name": "b", "vec": []},
    ]


# ---------------------------------------------------------------------------
# Sampling invariants (plans/sampling.py)
# ---------------------------------------------------------------------------


def test_split_deterministic_under_repartition(spark):
    """A document's split must not depend on physical layout: the same
    assignment regardless of partitioning (the property randomSplit lacks)."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    build = QUERIES["split_train_test"].builder
    base = {r["doc_id"]: r["split"] for r in build(spark, sf).collect()}
    # same query over a repartitioned scan
    from data_preparation_plugin_spark.plans.registry import load_table
    from data_preparation_plugin_spark.plans.sampling import hash_bucket
    from pyspark.sql import functions as F

    docs = load_table(spark, sf, "documents").repartition(13, "lang")
    bucket = hash_bucket("doc_id", 100)
    again = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id",
            F.when(bucket < 90, "train")
            .when(bucket < 95, "validation")
            .otherwise("test")
            .alias("split"),
        ).collect()
    }
    assert base == again


def test_split_fractions_near_nominal(spark):
    """Hash buckets are uniform: observed fractions within a loose band of
    90/5/5 (binomial tolerance at n=500)."""
    from collections import Counter

    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["split_train_test"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(rows)
    frac = Counter(r["split"] for r in rows)
    assert 0.84 <= frac["train"] / n <= 0.96
    assert 0.01 <= frac["validation"] / n <= 0.10
    assert 0.01 <= frac["test"] / n <= 0.10


def test_sample_composes_with_split(spark):
    """The 20% sample is a subset property of the bucket space: every
    sampled doc's bucket < 20, so sample ∩ train is exactly bucket < 20
    drawn from the train buckets — no correlation surprise."""
    from data_preparation_plugin_spark.plans.registry import load_table
    from data_preparation_plugin_spark.plans.sampling import hash_bucket
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = docs.select(hash_bucket("doc_id", 100).alias("b")).agg(
        F.max(F.col("b")).alias("mx"), F.min(F.col("b")).alias("mn")
    ).collect()[0]
    assert 0 <= got["mn"] and got["mx"] <= 99


def test_sequence_packing_invariants(spark):
    """Every doc packed exactly once; within a stream, seq ids are dense
    from 0 and each sequence's token total stays under budget + one doc
    (the doc that crosses the boundary closes the sequence)."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table
    from data_preparation_plugin_spark.plans.sampling import SEQ_PACK_BUDGET

    rows = QUERIES["sample_sequence_packing"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_docs = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs

    per_seq = defaultdict(int)
    max_doc = defaultdict(int)
    for r in rows:
        per_seq[(r.pack_stream, r.seq_id)] += r.n_tokens
        max_doc[(r.pack_stream, r.seq_id)] = max(
            max_doc[(r.pack_stream, r.seq_id)], r.n_tokens
        )
    for key, total in per_seq.items():
        assert total <= SEQ_PACK_BUDGET + max_doc[key], (key, total)
    # Dense sequence ids per stream.
    streams = defaultdict(set)
    for r in rows:
        streams[r.pack_stream].add(r.seq_id)
    for stream, seqs in streams.items():
        assert seqs == set(range(len(seqs))), (stream, sorted(seqs))


def test_packed_sequences_array_form_agrees(spark):
    """The driver-facing string form is exactly the comma-join of the
    local array form (same rows, numerically sorted ids)."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.sampling import (
        packed_sequences_array,
    )

    sf = "/root/testdata/sf0.001"
    arr = {
        (r.pack_stream, r.seq_id): (r.n_docs, r.total_tokens, r.doc_ids)
        for r in packed_sequences_array(spark, sf).collect()
    }
    strd = {
        (r.pack_stream, r.seq_id): (r.n_docs, r.total_tokens, r.doc_ids)
        for r in QUERIES["sample_packed_sequences"].builder(spark, sf).collect()
    }
    assert arr.keys() == strd.keys()
    for key, (n, tot, ids) in arr.items():
        sn, stot, sids = strd[key]
        assert (n, tot) == (sn, stot)
        assert sids == ",".join(str(i) for i in ids)
        assert ids == sorted(ids)


def test_weighted_mix_rates_hold(spark):
    """Kept fraction tracks the declared per-source rate (hash-exact
    membership, so the tolerance only covers small-source granularity)."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["sample_weighted_mix"].builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        assert r.rate_pct in (20, 80)
        got = r.n_kept / r.n_docs
        assert abs(got - r.rate_pct / 100) <= 0.2, (r.source, got, r.rate_pct)


def test_decontaminate_flags_are_real_overlaps(spark):
    """Every flagged doc genuinely shares >=1 shingle with the probe set,
    and no probe doc flags itself."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.dedup import (
        DECON_PROBE_MOD,
        SHINGLE_SIZE,
    )
    from data_preparation_plugin_spark.functions.text import exploded_shingles
    from data_preparation_plugin_spark.plans.registry import load_table

    flagged = QUERIES["dedup_decontaminate"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert flagged, "fixture should contain at least one contaminated doc"
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = exploded_shingles(docs, ["doc_id"], "text", SHINGLE_SIZE).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    probe = set()
    for doc_id, shingles in by_doc.items():
        if doc_id % DECON_PROBE_MOD == 0:
            probe |= shingles
    for r in flagged:
        assert r.doc_id % DECON_PROBE_MOD != 0
        overlap = by_doc[r.doc_id] & probe
        assert len(overlap) == r.n_contaminated_ngrams, r


def test_duplicate_spans_invariants(spark):
    """Spans are maximal, disjoint-by-construction, and bounded by doc size:
    dup_tokens <= n_tokens, max_span <= dup_tokens, and every flagged doc
    genuinely shares a k-gram with another doc (recomputed in Python)."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.dedup import SPAN_GRAM_TOKENS
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["dedup_duplicate_spans"].builder(spark, sf).collect()
    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, sf, "documents").collect()
    }
    gram_docs: dict[tuple, set] = {}
    k = SPAN_GRAM_TOKENS
    for doc_id, toks in docs.items():
        for i in range(len(toks) - k + 1):
            gram_docs.setdefault(tuple(toks[i : i + k]), set()).add(doc_id)
    dup_docs = {
        d for grams in gram_docs.values() if len(grams) > 1 for d in grams
    }
    flagged = {r.doc_id for r in rows if r.n_dup_spans > 0}
    assert flagged == dup_docs
    for r in rows:
        n_tokens = len(docs[r.doc_id])
        assert 0 <= r.dup_tokens <= n_tokens, r
        assert r.max_span_tokens <= r.dup_tokens, r
        if r.n_dup_spans:
            # Maximal merged spans each cover >= k tokens.
            assert r.max_span_tokens >= k, r
            assert r.dup_tokens >= r.n_dup_spans * k, r


def test_kmv_estimate_within_sampling_error(spark):
    """KMV with K=32 has relative standard error ~1/sqrt(K-2) ~ 18%;
    the fixture estimates must land within 4 sigma of exact."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["agg_kmv_distinct"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r.n_distinct_exact >= 32:
            assert r.rel_error <= 4 / (30**0.5), r


def test_pq_adc_recall_against_bruteforce(spark):
    """PQ top-5 must overlap the exact top-5 (>= 30% mean recall on the
    fixture). The synthetic embeddings are isotropic noise — PQ's worst
    case (no low-dimensional structure to exploit; k-means training was
    measured not to help) — so the floor is far below what real embedding
    manifolds give, but far above chance (~1%): a broken encoder or
    distance table fails it instantly."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["knn_bruteforce_cosine"].builder(spark, sf).collect()
    approx = QUERIES["knn_pq_adc"].builder(spark, sf).collect()
    by_q_exact: dict[int, set] = {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    by_q_pq: dict[int, set] = {}
    for r in approx:
        by_q_pq.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(by_q_pq) == set(by_q_exact)
    recalls = [
        len(by_q_pq[q] & by_q_exact[q]) / len(by_q_exact[q])
        for q in by_q_exact
    ]
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_cdc_apply_matches_sequential_replay(spark):
    """The windowed compaction must equal a literal sequential replay of
    the changelog in Python."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.analytics import (
        CDC_DELETE_MOD,
        CDC_KEYSPACE,
    )
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r.key: (r.last_seq, r.status, r.total_price, r.n_ops)
        for r in QUERIES["transform_cdc_apply"].builder(spark, sf).collect()
    }
    state: dict = {}
    counts: dict = {}
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    for row in sorted(orders, key=lambda r: r.o_orderkey):
        key = row.o_orderkey % CDC_KEYSPACE
        counts[key] = counts.get(key, 0) + 1
        if row.o_orderkey % CDC_DELETE_MOD == 0:
            state.pop(key, None)
        else:
            state[key] = (row.o_orderkey, row.o_orderstatus, row.o_totalprice)
    want = {
        k: (seq, st, price, counts[k])
        for k, (seq, st, price) in state.items()
    }
    assert got == want


def test_token_budget_invariants(spark):
    """Every source's admitted docs fit the budget; admission is a
    prefix of the hash order (no doc admitted after a rejected one)."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.sampling import (
        SOURCE_TOKEN_BUDGET,
    )

    rows = QUERIES["sample_token_budget"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
        assert r.cum_tokens <= SOURCE_TOKEN_BUDGET, r
    for src, rs in per_source.items():
        rs.sort(key=lambda r: r.cum_tokens)
        run = 0
        for r in rs:
            run += r.n_tokens
            # cum is exactly the running sum => admitted set is a prefix.
            assert r.cum_tokens == run, (src, r)


def test_balanced_labels_exact_balance(spark):
    """Each label is kept at exactly the global minority count."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table

    rows = QUERIES["sample_balanced_labels"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    counts = {
        r["label"]: r["c"]
        for r in emb.groupBy("label").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count(
                "*"
            ).alias("c")
        ).collect()
    }
    m = min(counts.values())
    kept: dict[int, int] = {}
    for r in rows:
        kept[r.label] = kept.get(r.label, 0) + 1
        assert 1 <= r.rn <= m
    assert set(kept) == set(counts)
    assert all(v == m for v in kept.values()), kept


def test_cms_estimate_one_sided(spark):
    """Count-min never undercounts: estimate >= exact on every row."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["agg_cms_heavy_hitters"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.exact_count, r
        assert r.overcount == r.cms_estimate - r.exact_count, r


def test_watermark_audit_accounting(spark):
    """Late counts are bounded by event counts and lateness is positive
    only when something was late."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["events_watermark_audit"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_late <= r.n_events, r
        if r.n_late == 0:
            assert r.max_lateness_us == 0, r
        else:
            assert r.max_lateness_us > 0, r


def test_interval_overlap_bounded_by_window(spark):
    """Per-window overlap time cannot exceed sessions x window length."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.events import MAINT_LEN_MIN

    rows = QUERIES["join_interval_overlap"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    win_us = MAINT_LEN_MIN * 60 * 1_000_000
    for r in rows:
        assert r.total_overlap_us <= r.n_sessions * win_us, r
        assert r.n_users <= r.n_sessions, r
        if r.n_sessions == 0:
            assert r.total_overlap_us == 0, r


def test_mad_outliers_accounting(spark):
    """Outlier counts are bounded, MAD is non-negative, and the median
    sits inside the group's value range."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["events_mad_outliers"].builder(spark, sf).collect()
    assert rows
    bounds = {
        r.event_type: r
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        assert 0 <= r.n_outliers <= r.n, r
        assert r.mad >= 0, r
        b = bounds[r.event_type]
        assert b.lo <= r.median_value <= b.hi, r


def test_ewma_bounded_by_user_value_range(spark):
    """An EWMA is a convex combination of the user's values, so every
    smoothed point must sit inside that user's [min, max] value range."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["events_ewma_smooth"].builder(spark, sf).collect()
    assert rows
    bounds = {
        r.user_id: r
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    eps = 1e-9
    for r in rows:
        b = bounds[r.user_id]
        assert b.lo - eps <= r.ewma <= b.hi + eps, r


def test_bigram_beats_unigram_on_separating_shuffled_text(spark):
    """Sanity: the bigram model assigns every doc a finite score and
    bigram counts are consistent (n_bigrams = n_tokens - 1 for docs
    with >= 2 tokens)."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table
    from data_preparation_plugin_spark.functions.text import tokens
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = {
        r.doc_id: r
        for r in QUERIES["text_bigram_logprob"].builder(spark, sf).collect()
    }
    sizes = {
        r.doc_id: r.n
        for r in load_table(spark, sf, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    assert rows
    for doc_id, r in rows.items():
        assert r.n_bigrams == sizes[doc_id] - 1, r
        assert r.avg_logprob < 0, r


def test_ivf_pq_recall_against_bruteforce(spark):
    """IVF-PQ neighbor lists must substantially overlap the exact
    brute-force top-k (approximate by design: residual quantization +
    unprobed cells both cost recall, so require > 0.5 overall)."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    approx = {}
    for r in QUERIES["knn_ivf_pq"].builder(spark, sf).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    exact = {}
    for r in QUERIES["knn_bruteforce_cosine"].builder(spark, sf).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(approx.get(q, set()) & n) for q, n in exact.items())
    total = sum(len(n) for n in exact.values())
    assert total > 0
    assert hits / total > 0.5, f"recall {hits}/{total}"


def test_semdedup_kept_set_is_independent(spark):
    """No two KEPT vectors in the same block may be near-duplicates: any
    near-dup pair is totally ordered by (centroid_dot, vec_id), so the
    beaten member must have been dropped."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.similarity import (
        SEM_DUP_MINDOT,
        PQ_QSCALE,
    )
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["dedup_semdedup_prune"].builder(spark, sf).collect()
    assert {r.is_kept for r in rows} == {0, 1}  # both paths exercised
    kept = {r.vec_id for r in rows if r.is_kept}
    cell = {r.vec_id: r.block for r in rows}
    import math

    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf, "embeddings").collect()
    }

    def qdot(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        qa = [math.floor(x / na * PQ_QSCALE) for x in a]
        qb = [math.floor(x / nb * PQ_QSCALE) for x in b]
        return sum(x * y for x, y in zip(qa, qb))

    kept_list = sorted(kept)
    for i, u in enumerate(kept_list):
        for v in kept_list[i + 1 :]:
            if cell[u] == cell[v]:
                assert qdot(vecs[u], vecs[v]) < SEM_DUP_MINDOT, (u, v)


def test_incremental_merge_equals_single_pass(spark):
    """The merged partial states must equal a from-scratch single-pass
    rollup computed in Spark itself."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    merged = {
        (r.ship_month, r.l_returnflag): (r.sum_qty, r.sum_cents, r.n_rows)
        for r in QUERIES["transform_incremental_agg_merge"]
        .builder(spark, sf)
        .collect()
    }
    direct = {
        (r.m, r.f): (r.q, r.c, r.n)
        for r in load_table(spark, sf, "lineitem")
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("m"),
            F.col("l_returnflag").alias("f"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "c"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert merged == direct


def test_interleave_positions_are_a_round_robin(spark):
    """Global positions are dense 0..N-1 and, for equal-size sources,
    consecutive positions cycle through all sources before repeating."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["sample_interleave_sources"].builder(spark, sf).collect()
    by_pos = sorted(rows, key=lambda r: r.global_pos)
    assert [r.global_pos for r in by_pos] == list(range(len(rows)))
    n_sources = len({r.source for r in rows})
    for i in range(0, len(by_pos) - n_sources, n_sources):
        block = {r.source for r in by_pos[i : i + n_sources]}
        assert len(block) == n_sources, f"block at {i} repeats a source"


def test_join_skew_profile_invariants(spark):
    """Ranks are 1..N, counts non-increasing, shares consistent."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.analytics import SKEW_TOP_N

    rows = sorted(
        QUERIES["profile_join_skew"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= SKEW_TOP_N
    counts = [r.n_orders for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 <= r.share_bp <= 10000
        assert r.x_avg_pct >= 0


def test_video_pool_bounds(spark):
    """Frame counts and pixel statistics stay inside their domains."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = (
        QUERIES["multimodal_video_temporal_pool"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert 1 <= r.n_frames <= 7, r
        assert 0 <= r.peak_pixel <= 255, r
        assert 0 <= r.mean_pixel_e4 <= 255 * 10000, r
        assert 0 <= r.motion_range_e4 <= 255 * 10000, r


def test_table_diff_reports_only_changes(spark):
    """Every emitted key belongs to exactly one change kind, masks fire
    only on 'changed' rows, and the three injected stripes all appear."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["transform_table_diff"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    kinds = {}
    for r in rows:
        assert r.o_orderkey not in kinds, "duplicate key in diff"
        kinds[r.o_orderkey] = r.change
        if r.change != "changed":
            assert r.status_changed == 0 and r.price_changed == 0, r
        else:
            assert r.status_changed or r.price_changed, r
    assert set(kinds.values()) == {"added", "removed", "changed"}


def test_dense_surrogate_ids_are_a_permutation(spark):
    """Ids are exactly 0..N-1 with every key appearing once, stable
    across physical layout (repartitioned rebuild assigns same ids)."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["transform_dense_surrogate_ids"].builder(
        spark, sf
    ).collect()
    ids = sorted(r.surrogate_id for r in rows)
    assert ids == list(range(len(rows)))
    again = {
        r.c_custkey: r.surrogate_id
        for r in QUERIES["transform_dense_surrogate_ids"]
        .builder(spark, sf)
        .collect()
    }
    assert {r.c_custkey: r.surrogate_id for r in rows} == again


def test_gap_fill_grid_is_dense_and_filled(spark):
    """Per user: hour grid has no holes, fills carry real observed
    values, and n_events sums to the user's event count."""
    from collections import defaultdict
    from datetime import timedelta

    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.events import GAPFILL_USER_MOD
    from data_preparation_plugin_spark.plans.registry import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["events_gap_fill"].builder(spark, sf).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    truth = {
        r.user_id: r.n
        for r in load_table(spark, sf, "events")
        .where(F.col("user_id") % GAPFILL_USER_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_user) == set(truth)
    for uid, rs in per_user.items():
        rs.sort(key=lambda r: r.hour_ts)
        for a, b in zip(rs, rs[1:]):
            assert b.hour_ts - a.hour_ts == timedelta(hours=1), uid
        assert sum(r.n_events for r in rs) == truth[uid]
        assert all(r.filled_value is not None for r in rs)


def test_global_shuffle_is_a_sharded_permutation(spark):
    """Every doc appears exactly once, per-shard positions are dense
    0..n-1, and the assignment is stable across rebuilds."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["sample_global_shuffle"].builder(spark, sf).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert len({r.doc_id for r in rows}) == len(rows)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    again = {(r.doc_id): (r.shard, r.pos)
             for r in QUERIES["sample_global_shuffle"].builder(spark, sf).collect()}
    assert {r.doc_id: (r.shard, r.pos) for r in rows} == again


def test_curriculum_phases_are_monotone_in_difficulty(spark):
    """Value-level quartile binning: every doc in a lower phase is no
    longer (n_chars) than any doc in a higher phase, positions are dense
    per (phase, shard), and all docs are covered."""
    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["sample_curriculum_order"].builder(spark, sf).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in registry.load_table(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    assert {r.doc_id for r in rows} == set(docs)
    bounds = {}
    for r in rows:
        lo, hi = bounds.get(r.phase, (1 << 60, -1))
        v = docs[r.doc_id]
        bounds[r.phase] = (min(lo, v), max(hi, v))
    phases = sorted(bounds)
    for a, b in zip(phases, phases[1:]):
        assert bounds[a][1] <= bounds[b][0], (bounds, a, b)
    per_bucket = {}
    for r in rows:
        per_bucket.setdefault((r.phase, r.shard), []).append(r.pos)
    for key, poss in per_bucket.items():
        assert sorted(poss) == list(range(len(poss))), key


def test_attribution_matches_sequential_replay(spark):
    """Replaying each user's event stream in order reproduces every
    purchase's attributed touch (and its gap) exactly."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_id: (r.touch_event_id, r.touch_type, r.gap_us)
        for r in QUERIES["events_attribution_last_touch"]
        .builder(spark, sf)
        .collect()
    }
    events = defaultdict(list)
    for r in (
        registry.load_table(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    ):
        events[r.user_id].append(r)
    expected = {}
    for stream in events.values():
        stream.sort(key=lambda r: (r.ts, r.event_id))
        last = None
        for r in stream:
            if r.event_type == "purchase":
                if last is None:
                    expected[r.event_id] = (None, None, None)
                else:
                    from datetime import timedelta

                    gap = (r.ts - last.ts) // timedelta(microseconds=1)
                    expected[r.event_id] = (last.event_id, last.event_type, gap)
            elif r.event_type in ("view", "click"):
                last = r
    assert got == expected


def test_k_anonymize_releases_no_small_group(spark):
    """After suppression, every released quasi-identifier combination is
    shared by >= k rows, and anonymity_set reports true group sizes."""
    from collections import Counter

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.relational import K_ANONYMITY

    rows = QUERIES["transform_k_anonymize"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    released = Counter(
        (r.nation_out, r.segment_out) for r in rows if not r.suppressed
    )
    for qi, n in released.items():
        assert qi[0] != -1 and qi[1] != "*"
        assert n >= K_ANONYMITY, (qi, n)
        assert all(
            r.anonymity_set == n
            for r in rows
            if (r.nation_out, r.segment_out) == qi
        )
    for r in rows:
        if r.suppressed:
            assert (r.nation_out, r.segment_out) == (-1, "*")
            assert r.anonymity_set < K_ANONYMITY


def test_label_propagation_two_rounds_match_replay(spark):
    """Python replay of both LPA rounds reproduces every adoption and its
    vote count — and round 2 must produce at least one multi-vote pick
    (the degeneracy the two-round design exists to escape)."""
    from collections import Counter, defaultdict

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.dedup import (
        dedup_minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["graph_label_propagation_step"].builder(spark, sf).collect()
    nbrs = defaultdict(set)
    for p in dedup_minhash_lsh_pairs(spark, sf).collect():
        nbrs[p.doc_a].add(p.doc_b)
        nbrs[p.doc_b].add(p.doc_a)
    l1 = {node: min(ns) for node, ns in nbrs.items()}
    expected = {}
    for node, ns in nbrs.items():
        counts = Counter(l1[n] for n in ns)
        best_votes = max(counts.values())
        label = min(l for l, c in counts.items() if c == best_votes)
        expected[node] = (label, best_votes)
    assert {r.doc_id: (r.new_label, r.votes) for r in rows} == expected
    assert len({r.doc_id for r in rows}) == len(rows)
    assert any(r.votes > 1 for r in rows), "round 2 should be non-degenerate"


def test_radius_search_agrees_with_numpy(spark):
    """Brute-force numpy recompute at sf0.001: identical (query, neighbor)
    sets at the 6dp-rounded threshold."""
    import numpy as np

    from data_preparation_plugin_spark.plans import QUERIES, registry
    from data_preparation_plugin_spark.plans.similarity import (
        N_QUERY_VECS,
        RADIUS_TAU,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["knn_radius_search"].builder(spark, sf).collect()
    }
    emb = (
        registry.load_table(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    cos = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
    expected = {
        (int(ids[qi]), int(ids[j]))
        for qi in range(len(ids))
        if ids[qi] < N_QUERY_VECS
        for j in range(len(ids))
        if ids[j] != ids[qi] and cos[qi, j] >= RADIUS_TAU
    }
    assert got == expected


def test_mmr_picks_are_distinct_and_scores_non_increasing(spark):
    """Per query: rank 1 is the single most relevant candidate, picks are
    distinct, and greedy scores never increase with rank."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    mmr = defaultdict(dict)
    for r in QUERIES["knn_mmr_diverse"].builder(spark, sf).collect():
        mmr[r.query_id][r.mmr_rank] = r
    top1 = {
        r.query_id: r.neighbor_id
        for r in QUERIES["knn_bruteforce_cosine"].builder(spark, sf).collect()
        if r.rn == 1
    }
    for qid, picks in mmr.items():
        assert sorted(picks) == [1, 2, 3]
        assert len({p.selected_id for p in picks.values()}) == 3
        assert picks[1].selected_id == top1[qid]
        assert picks[1].mmr_score >= picks[2].mmr_score >= picks[3].mmr_score


def test_code_prose_gate_is_pure_integer_arithmetic(spark):
    """Recompute the is_code gate from the emitted integer counts —
    cross-multiplied comparisons, no float ratio anywhere."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["text_code_prose_ratio"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    for r in rows:
        assert 0 <= r.symbol_count <= r.n_chars
        assert 0 <= r.keyword_count <= r.n_tokens
        assert r.is_code == (
            r.symbol_count * 50 > r.n_chars or r.keyword_count * 10 > r.n_tokens
        )


def test_incremental_dedup_flags_exactly_the_unseen(spark):
    """A new-snapshot doc is novel iff its text appears nowhere in the
    index split — recomputed from the raw table."""
    from data_preparation_plugin_spark.plans import QUERIES, registry
    from data_preparation_plugin_spark.plans.dedup import INCREMENTAL_MOD

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["dedup_incremental_new_docs"].builder(spark, sf).collect()
    docs = registry.load_table(spark, sf, "documents").select(
        "doc_id", "text"
    ).collect()
    index_texts = {r.text for r in docs if r.doc_id % INCREMENTAL_MOD != 0}
    new_docs = {r.doc_id: r.text for r in docs if r.doc_id % INCREMENTAL_MOD == 0}
    assert {r.doc_id for r in rows} == set(new_docs)
    for r in rows:
        assert r.is_novel == (new_docs[r.doc_id] not in index_texts)


def test_threshold_sweep_is_monotone_in_threshold(spark):
    """Tightening the gate can only shrink what's kept; threshold 0 keeps
    everything (counts match the raw language histogram)."""
    from collections import Counter, defaultdict

    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["curation_threshold_sweep"].builder(spark, sf).collect()
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r.lang][r.threshold] = (r.docs_kept, r.tokens_kept)
    lang_counts = Counter(
        r.lang
        for r in registry.load_table(spark, sf, "documents")
        .select("lang")
        .collect()
    )
    for lang, series in by_lang.items():
        ts = sorted(series)
        assert series[0][0] == lang_counts[lang]
        for a, b in zip(ts, ts[1:]):
            assert series[a][0] >= series[b][0], (lang, a, b)
            assert series[a][1] >= series[b][1], (lang, a, b)


def test_l_diversity_released_groups_are_diverse(spark):
    """Released groups carry >= l distinct sensitive values, recomputed
    from the raw table; suppressed groups are fully generalized."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES, registry
    from data_preparation_plugin_spark.plans.relational import (
        L_DIV_BAND,
        L_DIVERSITY,
    )

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["transform_l_diversity"].builder(spark, sf).collect()
    import math

    segs = defaultdict(set)
    cust = registry.load_table(spark, sf, "customer").collect()
    for c in cust:
        band = math.floor(c.c_acctbal / L_DIV_BAND)
        segs[(c.c_nationkey, band)].add(c.c_mktsegment)
    by_key = {c.c_custkey: c for c in cust}
    for r in rows:
        c = by_key[r.c_custkey]
        true_l = len(segs[(c.c_nationkey, math.floor(c.c_acctbal / L_DIV_BAND))])
        assert r.l_distinct == true_l
        if r.suppressed:
            assert true_l < L_DIVERSITY
            assert (r.nation_out, r.band_out) == (-1, -1)
        else:
            assert true_l >= L_DIVERSITY
            assert r.nation_out == c.c_nationkey


def test_nearest_centroid_beats_every_other_seat(spark):
    """For each point, no other nation center is strictly closer (and
    ties resolve to the smaller key)."""
    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["geo_nearest_centroid"].builder(spark, sf).collect()
    centers = {n: (n * 14.0 - 173.25, n * 7.0 - 86.75) for n in range(25)}
    for r in rows:
        k = r.c_custkey
        x = (k % 360) - 180 + ((k * 7919) % 1000) / 1000.0
        y = ((k * 31) % 180) - 90 + ((k * 104729) % 1000) / 1000.0
        best = min(
            ((x - cx) ** 2 + (y - cy) ** 2, n) for n, (cx, cy) in centers.items()
        )
        assert (r.dist2, r.nearest_nation) == best


def test_streaming_datasource_delivers_every_offset(spark):
    """The Python streaming source must deliver all batches exactly once:
    per-sensor row count is batches x per-batch and n_batches is the
    full offset range."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.ingest import (
        _PYDSS_BATCHES,
        _PYDSS_PER_BATCH,
        _PYDSS_SENSORS,
    )

    rows = QUERIES["source_python_datasource_stream"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == _PYDSS_SENSORS
    for r in rows:
        assert r.n_rows == _PYDSS_BATCHES * _PYDSS_PER_BATCH
        assert r.n_batches == _PYDSS_BATCHES


def test_weighted_median_crosses_half_total_weight(spark):
    """Cumulative weight strictly below the reported median is < half the
    group total; adding the median's rows reaches half."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    got = {
        r.l_returnflag: r.weighted_median_price
        for r in QUERIES["agg_weighted_median"].builder(spark, sf).collect()
    }
    groups = defaultdict(list)
    for r in (
        registry.load_table(spark, sf, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    ):
        groups[r.l_returnflag].append((r.l_extendedprice, r.l_quantity))
    for flag, items in groups.items():
        items.sort()
        total = sum(w for _, w in items)
        below = sum(w for v, w in items if v < got[flag])
        upto = sum(w for v, w in items if v <= got[flag])
        assert 2 * below < total <= 2 * upto, (flag, got[flag])


def test_observed_gate_metrics_match_recount(spark):
    """The CollectMetrics side channel reports exactly the counts a
    second scan would: rows seen, bad prices, null keys."""
    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    df = QUERIES["transform_observed_quality_gate"].builder(spark, sf)
    df.collect()  # the action that populates the observation
    metrics = df._dpp_observation.get
    orders = registry.load_table(spark, sf, "orders").collect()
    assert metrics["rows_seen"] == len(orders)
    assert metrics["bad_price"] == sum(1 for o in orders if o.o_totalprice <= 0)
    assert metrics["null_key"] == sum(1 for o in orders if o.o_custkey is None)


def test_kcenter_picks_maximize_min_distance(spark):
    """Numpy replay of the greedy farthest-point loop reproduces every
    pick and its coverage radius."""
    import numpy as np

    from data_preparation_plugin_spark.plans import QUERIES, registry
    from data_preparation_plugin_spark.plans.similarity import KCENTER_K

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.pick, r.center_id, r.coverage_radius)
        for r in QUERIES["knn_kcenter_coreset"].builder(spark, sf).collect()
    )
    emb = (
        registry.load_table(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    order = np.argsort(ids)
    ids, mat = ids[order], np.array(
        [emb[i].embedding for i in order], dtype=np.float64
    )
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    seed = 0  # smallest vec_id after the sort
    alive = np.ones(len(ids), bool)
    alive[seed] = False
    dmin = np.round(1.0 - unit @ unit[seed], 6)
    expected = [(1, int(ids[seed]), 0.0)]
    for pick in range(2, KCENTER_K + 1):
        masked = np.where(alive, dmin, -np.inf)
        best = int(np.flatnonzero(masked == masked.max())[0])
        expected.append((pick, int(ids[best]), float(np.round(dmin[best], 4))))
        alive[best] = False
        dmin = np.minimum(dmin, np.round(1.0 - unit @ unit[best], 6))
    assert got == sorted(expected)


def test_bm25_monotonic_in_tf_for_equal_length(spark):
    """Within one term, a doc with higher tf and shorter length never
    ranks below one with lower tf and longer length (BM25 is monotone in
    tf and anti-monotone in dl); scores are positive."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES, registry
    from data_preparation_plugin_spark.functions.text import tokens  # noqa: F401

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["text_bm25_topk"].builder(spark, sf).collect()
    dl = {
        r.doc_id: r.dl
        for r in registry.load_table(spark, sf, "documents")
        .selectExpr(
            "doc_id", "size(split(trim(lower(text)), '\\\\s+')) AS dl"
        )
        .collect()
    }
    by_term = defaultdict(list)
    for r in rows:
        assert r.bm25 > 0
        by_term[r.term].append(r)
    for term, lst in by_term.items():
        lst.sort(key=lambda r: r.rn)
        for hi, lo in zip(lst, lst[1:]):
            assert hi.bm25 >= lo.bm25
            # dominance: strictly more tf AND no longer doc => ranks
            # higher — except on 4dp-rounded score ties, where the
            # committed round-before-rank convention breaks by doc_id.
            if (
                hi.bm25 != lo.bm25
                and hi.tf < lo.tf
                and dl[hi.doc_id] >= dl[lo.doc_id]
            ):
                raise AssertionError((term, hi, lo))


def test_lsh_calibration_err_is_consistent(spark):
    """abs_err equals |est - exact| recomputed from the emitted columns,
    estimates are multiples of 1/8 in [0, 1], and every LSH pair appears
    exactly once."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.dedup import (
        dedup_minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["dedup_lsh_calibration"].builder(spark, sf).collect()
    pairs = {
        (p.doc_a, p.doc_b) for p in dedup_minhash_lsh_pairs(spark, sf).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == pairs
    for r in rows:
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert round(r.est_jaccard * 8, 6) == int(round(r.est_jaccard * 8))
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) < 2e-4


def test_temporal_holdout_never_trains_on_the_future(spark):
    """Per user: every train event precedes every holdout event, the
    train share is the largest k with 1000k <= 800n, and all events are
    covered exactly once."""
    from collections import defaultdict

    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["split_temporal_holdout"].builder(spark, sf).collect()
    n_events = registry.load_table(spark, sf, "events").count()
    assert len(rows) == len({r.event_id for r in rows}) == n_events
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for user, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        n = len(evs)
        k = sum(1 for r in evs if r.split == "train")
        assert k == n * 800 // 1000
        assert all(r.split == "train" for r in evs[:k])
        assert all(r.split == "holdout" for r in evs[k:])


def test_bmp_decoder_undoes_flip_bgr_and_stride(spark):
    """Corrupting any one of the three BMP storage rules in a reference
    re-encode changes the pinned statistics — and the real decoder's
    output matches a straight numpy reconstruction of the logical image."""
    import numpy as np

    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["multimodal_decode_bmp"].builder(spark, sf).collect()
    for r in rows[:25]:
        d = r.doc_id
        w, h = d % 13 + 3, d % 9 + 2
        k = np.arange(w * h * 3, dtype=np.int64)
        rgb = ((d * 11 + k) % 256).reshape(h, w, 3)
        assert (r.width, r.height) == (w, h)
        assert r.mean_pixel == rgb.mean()
        assert r.mean_red == rgb[:, :, 0].mean()
        assert r.top_row_mean == rgb[0].mean()
        # the three stats are genuinely sensitive to the storage rules
        assert rgb[0].mean() != rgb[-1].mean() or h == 1
        assert rgb[:, :, 0].mean() != rgb[:, :, 2].mean()


def test_langid_confusion_shares_sum_to_one(spark):
    """Every gold class's shares sum to 1 (4dp), diagonal cells exist for
    the marker languages, and cell counts recount from text_langid."""
    from collections import Counter, defaultdict

    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["text_langid_confusion"].builder(spark, sf).collect()
    raw = Counter(
        (r.lang, r.predicted_lang)
        for r in QUERIES["text_langid"].builder(spark, sf).collect()
    )
    assert {(r.lang, r.predicted_lang): r.n_docs for r in rows} == dict(raw)
    shares = defaultdict(float)
    for r in rows:
        shares[r.lang] += r.class_share
    for lang, total in shares.items():
        assert abs(total - 1.0) < 1e-3, (lang, total)


def test_frequency_spectrum_accounts_for_every_row(spark):
    """sum(freq * n_keys) equals the table's row count and sum(n_keys)
    its key NDV — the spectrum partitions both exactly."""
    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["profile_key_frequency_spectrum"].builder(spark, sf).collect()
    orders = registry.load_table(spark, sf, "orders")
    assert sum(r.n_rows for r in rows) == orders.count()
    assert sum(r.n_keys for r in rows) == orders.select("o_custkey").distinct().count()
    for r in rows:
        assert r.n_rows == r.freq * r.n_keys


def test_dp_noise_is_reproducible_and_correctly_scaled(spark):
    """Same release twice -> identical noise (no fresh budget burned);
    noise replays from the seeded inverse CDF; |noise| is Laplace-scale
    plausible (ln bound from the 6dp-rounded uniform)."""
    import hashlib
    import math

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.relational import (
        DP_EPSILON,
        DP_SEED,
    )

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["transform_dp_noisy_counts"].builder(spark, sf).collect()
    again = QUERIES["transform_dp_noisy_counts"].builder(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    for r in rows:
        h = hashlib.md5((DP_SEED + r.c_mktsegment).encode()).hexdigest()
        u = round(int(h[:8], 16) / 4294967296.0 - 0.5, 6)
        assert r.u == u
        noise = (1.0 / DP_EPSILON) * (1 if u >= 0 else -1) * math.log(1 - 2 * abs(u))
        assert r.noisy_count == round(r.exact_count - noise)


def test_point_in_time_join_reconciles_to_fact_count(spark):
    """Exactly one dimension version matches each fact: aggregate item
    counts sum to the lineitem row count, and revenue to its total."""
    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["join_point_in_time_scd2"].builder(spark, sf).collect()
    lineitem = registry.load_table(spark, sf, "lineitem")
    assert sum(r.n_items for r in rows) == lineitem.count()
    total = sum(r.revenue for r in rows)
    expected = lineitem.agg({"l_extendedprice": "sum"}).collect()[0][0]
    assert abs(total - expected) < 0.05 * len(rows)


def test_deadline_funnel_is_a_subset_of_the_unbounded_funnel(spark):
    """Every deadline conversion is also an unbounded conversion, never
    earlier than it, and within the deadline of its previous stage."""
    from datetime import timedelta

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.analytics import (
        FUNNEL_DEADLINE_HOURS,
    )

    sf = "/root/testdata/sf0.001"
    ddl = timedelta(hours=FUNNEL_DEADLINE_HOURS)
    bounded = {
        r.user_id: r
        for r in QUERIES["events_funnel_deadline"].builder(spark, sf).collect()
    }
    unbounded = {
        r.user_id: r
        for r in QUERIES["events_funnel_conversion"].builder(spark, sf).collect()
    }
    assert set(bounded) == set(unbounded)
    for uid, b in bounded.items():
        u = unbounded[uid]
        assert b.first_view == u.first_view
        if b.converted_click:
            assert b.first_click >= u.first_click
            assert b.first_click <= b.first_view + ddl
        if b.converted_purchase:
            assert b.converted_click
            assert b.first_purchase <= b.first_click + ddl


def test_rfm_codes_follow_the_medians(spark):
    """Recompute the three medians from the emitted columns: every
    customer's code digit agrees with its median comparison, and all
    code digits are in {1, 2}."""
    import statistics

    from data_preparation_plugin_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["events_rfm_segmentation"].builder(spark, sf).collect()
    r_med = statistics.median(r.recency_days for r in rows)
    f_med = statistics.median(r.frequency for r in rows)
    m_med = statistics.median(r.monetary for r in rows)
    for r in rows:
        expect = (
            (2 if r.recency_days <= r_med else 1) * 100
            + (2 if r.frequency > f_med else 1) * 10
            + (2 if r.monetary > m_med else 1)
        )
        assert r.rfm_code == expect


def test_pair_audit_counts_nest_properly(spark):
    """n_trainable <= n_paired <= n_docs per language, and the paired
    total equals the true id intersection size."""
    from data_preparation_plugin_spark.plans import QUERIES, registry

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["multimodal_pair_audit"].builder(spark, sf).collect()
    docs = {
        r.doc_id
        for r in registry.load_table(spark, sf, "documents")
        .select("doc_id")
        .collect()
    }
    vecs = {
        r.vec_id
        for r in registry.load_table(spark, sf, "embeddings")
        .select("vec_id")
        .collect()
    }
    for r in rows:
        assert r.n_trainable <= r.n_paired <= r.n_docs
        assert r.n_valid_vec <= r.n_paired
    assert sum(r.n_paired for r in rows) == len(docs & vecs)


# -- MultiPatch shapefile parsing ------------------------------------------

_coord = st.integers(min_value=-1000, max_value=1000)
_point3 = st.tuples(_coord, _coord, _coord)


@st.composite
def _multipatch_parts(draw):
    """Random mix of MultiPatch parts: triangle surfaces and ring groups."""
    parts = []
    for _ in range(draw(st.integers(1, 4))):
        kind = draw(st.sampled_from(["strip", "fan", "ring_group"]))
        if kind in ("strip", "fan"):
            pts = draw(st.lists(_point3, min_size=3, max_size=7))
            parts.append((0 if kind == "strip" else 1, pts))
        else:
            ring = draw(st.lists(_point3, min_size=3, max_size=6))
            closed = ring + [ring[0]]
            parts.append((2, closed))  # outer ring
            if draw(st.booleans()):
                hole = draw(st.lists(_point3, min_size=3, max_size=5))
                parts.append((3, hole + [hole[0]]))  # inner ring
    return parts


def _pack_multipatch(parts):
    import struct as _s

    pts = [p for _t, ps in parts for p in ps]
    body = _s.pack("<i", 31)  # record body includes the shape-type int
    body += _s.pack("<4d", 0, 0, 0, 0)
    body += _s.pack("<ii", len(parts), len(pts))
    start = 0
    for _t, ps in parts:
        body += _s.pack("<i", start)
        start += len(ps)
    for t, _ps in parts:
        body += _s.pack("<i", t)
    for x, y, _z in pts:
        body += _s.pack("<2d", x, y)
    body += _s.pack("<2d", 0, 0)
    for _x, _y, z in pts:
        body += _s.pack("<d", z)
    return body


@given(_multipatch_parts())
def test_multipatch_parse_invariants(parts):
    """Structural contract on random MultiPatch records: polygon count =
    triangles per surface part + one per outer/first ring; every ring in
    the WKT is closed; every vertex is 3-dimensional."""
    import re

    from data_preparation_plugin_spark.operators.shapefile import (
        _parse_multipatch,
    )

    wkt = _parse_multipatch(_pack_multipatch(parts))
    assert wkt.startswith("MULTIPOLYGON Z (")
    expected_polys = sum(
        len(ps) - 2 if t in (0, 1) else (1 if t in (2, 4) else 0)
        for t, ps in parts
    )
    # Split the top level by paren depth: each depth-1 span is one polygon.
    inner = wkt[len("MULTIPOLYGON Z ("):-1]
    polys, depth, start = [], 0, None
    for i, ch in enumerate(inner):
        if ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                polys.append(inner[start : i + 1])
    assert len(polys) == expected_polys
    for ring in re.findall(r"\(([^()]+)\)", wkt):
        verts = [v.strip() for v in ring.split(",")]
        assert verts[0] == verts[-1]  # closed
        assert all(len(v.split()) == 3 for v in verts)  # 3-D


@given(
    st.text(alphabet="01", min_size=8, max_size=8),
    st.integers(min_value=1, max_value=8),
)
def test_multiprobe_flip_is_involutive_hamming_one(bucket, i):
    """The Spark and DuckDB bit-flip expressions both multi-probe LSH and
    the rerank audit's reachability rule depend on: flipping bit i is a
    Hamming-1 involution, and the two engines produce the same string."""
    import duckdb

    from data_preparation_plugin_spark.plans.similarity import _flip_sql

    con = duckdb.connect()
    flipped = con.execute(
        f"SELECT {_flip_sql('b', i)} FROM (SELECT ? AS b)", [bucket]
    ).fetchone()[0]
    assert len(flipped) == 8
    assert sum(a != c for a, c in zip(bucket, flipped)) == 1
    assert flipped[i - 1] != bucket[i - 1]
    back = con.execute(
        f"SELECT {_flip_sql('b', i)} FROM (SELECT ? AS b)", [flipped]
    ).fetchone()[0]
    assert back == bucket


def test_flip_col_matches_flip_sql(spark):
    """One Spark evaluation of _flip_col per position, value-compared to
    the DuckDB _flip_sql twin over every 8-bit bucket pattern prefix."""
    import duckdb

    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans.similarity import (
        N_HYPERPLANES,
        _flip_col,
        _flip_sql,
    )

    buckets = ["00000000", "11111111", "10110010", "01001101"]
    df = spark.createDataFrame([(b,) for b in buckets], "b string").select(
        "b",
        *[
            _flip_col(F.col("b"), i).alias(f"f{i}")
            for i in range(1, N_HYPERPLANES + 1)
        ],
    )
    con = duckdb.connect()
    for row in df.collect():
        for i in range(1, N_HYPERPLANES + 1):
            expect = con.execute(
                f"SELECT {_flip_sql('b', i)} FROM (SELECT ? AS b)", [row.b]
            ).fetchone()[0]
            assert row[f"f{i}"] == expect


# URL-ish strings for the canonicalization property: structured URLs plus
# printable-ASCII junk. Newlines are excluded BY CONTRACT: Java's default
# `$` matches before a final line terminator while RE2's matches only at
# end-of-text, so a trailing-newline "URL" is outside the domain the two
# engines can agree on (and outside any real URL column).
_url_host = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-", min_size=1, max_size=12
)
_url_structured = st.builds(
    lambda scheme, www, host, path, query, slash: (
        scheme + www + host + path + query + slash
    ),
    st.sampled_from(["", "http://", "https://", "ftp://"]),
    st.sampled_from(["", "www.", "www.www.", "wwww."]),
    _url_host,
    st.text(alphabet="abc/0?", max_size=10).map(lambda p: "/" + p if p else ""),
    st.sampled_from(["", "?", "?a=1", "?a=1&b=2?c", "??"]),
    st.sampled_from(["", "/", "//"]),
)
_url_junk = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126
    ),
    max_size=24,
)
_urls = st.lists(
    st.one_of(_url_structured, _url_junk), min_size=1, max_size=24
)


@settings(max_examples=8, deadline=None)
@given(_urls)
def test_url_canonicalization_engines_agree(spark, urls):
    """`dedup_url_keep_best` / `text_url_canonicalize` share one
    canonicalization chain with SQL and Column twins; both engines must
    rewrite ANY newline-free string identically (scheme, www., query,
    trailing slash — including pathological stacks like `www.www.`,
    `??`, and junk that is not a URL at all)."""
    import duckdb

    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans.text import (
        URL_CANON_SQL,
        canonical_url_col,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        canonical_url_col(F.col("url")).alias("c")
    )
    got = [r.c for r in df.collect()]
    con = duckdb.connect()
    expect = [
        con.execute(
            f"SELECT {URL_CANON_SQL} FROM (SELECT ? AS url)", [u]
        ).fetchone()[0]
        for u in urls
    ]
    assert got == expect


def test_dsir_importance_invariants(spark):
    """DSIR's score is a log likelihood ratio: `selected` must equal
    sign(logweight) exactly, and the target slice (lang='en') must score
    higher on average than the rest — the separation the resampling
    step exists to exploit."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table

    from conftest import SF_DIR

    scored = {
        r.doc_id: r
        for r in QUERIES["sample_dsir_importance"]
        .builder(spark, SF_DIR)
        .collect()
    }
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    assert set(scored) == set(langs)
    for r in scored.values():
        assert (r.selected == 1) == (r.dsir_logweight > 0), r
    en = [r.dsir_logweight for d, r in scored.items() if langs[d] == "en"]
    rest = [r.dsir_logweight for d, r in scored.items() if langs[d] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_t_closeness_bounds_and_global_consistency(spark):
    """Total variation distance is in [0, 1]; the breach flag must agree
    with the exact integer gate; and group sizes must sum to the table."""
    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.registry import load_table

    from conftest import SF_DIR

    rows = QUERIES["transform_t_closeness"].builder(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.group_size for r in rows) == n
    for r in rows:
        assert 0.0 <= r.t_closeness <= 1.0, r
        assert r.breached == (5 * r.tvd_numerator > 2 * r.group_size * n), r


def test_bloom_prefilter_candidates_superset_of_matches(spark):
    """The bloom filter's error is one-sided: candidates >= matches per
    group, and the matched side must equal the plain semi-join answer."""
    from pyspark.sql import functions as F

    from data_preparation_plugin_spark.plans import QUERIES
    from data_preparation_plugin_spark.plans.dedup import (
        BLOOM_JOIN_PRIORITY,
    )
    from data_preparation_plugin_spark.plans.registry import load_table

    from conftest import SF_DIR

    rows = QUERIES["join_bloom_prefilter"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_candidate_rows >= r.n_matched_rows, r
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == BLOOM_JOIN_PRIORITY
    )
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        (r.l_linestatus, r.n): None
        for r in li.join(
            orders, li.l_orderkey == orders.o_orderkey, "left_semi"
        )
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.l_linestatus, r.n_matched_rows) for r in rows}
    assert got == set(exact)


def test_stream_cms_estimate_one_sided_and_tight(spark):
    """CMS error is one-sided (estimate >= exact) and bounded by the
    sketch's collision mass; on this fixture the top-K overcounts stay
    small relative to the exact counts."""
    from data_preparation_plugin_spark.plans import QUERIES

    from conftest import SF_DIR

    rows = QUERIES["events_stream_cms_topk"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0, r
        assert r.cms_estimate == r.exact_count + r.overcount, r


# --- r14: properties oracle parity CANNOT check (both engines share the
# construction, so a conceptual bug would pass the hash check in both) ---

from data_preparation_plugin_spark.plans.dedup import (  # noqa: E402
    CDC_GEAR_BITS,
    CDC_GEAR_MOD,
    CDC_GEAR_MULT,
)

_GEAR_REG = 1 << CDC_GEAR_BITS


def _gear_boundaries(s: str) -> set[int]:
    """Pure-Python model of the Spark gear fold: positions i (1-based)
    after which a chunk boundary falls (i < len(s) guard included)."""
    h, out, n = 0, set(), len(s)
    for i, c in enumerate(s, start=1):
        h = (2 * h + (ord(c) * CDC_GEAR_MULT) % _GEAR_REG) % _GEAR_REG
        if h % CDC_GEAR_MOD == 0 and i < n:
            out.add(i)
    return out


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=200,
)


@given(ascii_text, ascii_text, st.integers(min_value=0, max_value=200))
def test_gear_cdc_boundaries_realign_after_insertion(s, ins, pos):
    """THE content-defined-chunking contract: inserting text shifts only
    boundaries within one hash window of the edit — every boundary at
    least CDC_GEAR_BITS characters past the insertion point re-aligns
    exactly (shifted by the insertion length), because the register mod
    2^CDC_GEAR_BITS depends on only the last CDC_GEAR_BITS characters.
    Fixed-width chunking has no such property (one insertion re-keys
    the whole tail). Oracle parity cannot test this: it needs TWO
    corpus versions."""
    pos = min(pos, len(s))
    s2 = s[:pos] + ins + s[pos:]
    b1, b2 = _gear_boundaries(s), _gear_boundaries(s2)
    L = len(ins)
    w = CDC_GEAR_BITS
    assert {b + L for b in b1 if b >= pos + w} == {
        b for b in b2 if b >= pos + L + w
    }


def _dup_positions(docs, lvl, candidates=None):
    """Positions whose lvl-substring occurs in >= 2 distinct docs.

    ``candidates=None`` scans every position (brute force); otherwise
    only the supplied (doc, pos) set is considered — the ladder's
    survivor restriction. Duplication evidence (the substring index) is
    always built from the SAME candidate set, mirroring the registered
    plan where each level digests only surviving positions."""
    from collections import defaultdict

    occs = defaultdict(set)
    pool = []
    for di, s in enumerate(docs):
        for p in range(len(s) - lvl + 1):
            if candidates is not None and (di, p) not in candidates:
                continue
            pool.append((di, p, s[p : p + lvl]))
            occs[s[p : p + lvl]].add(di)
    return {(di, p) for di, p, sub in pool if len(occs[sub]) >= 2}


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=2,
        max_size=5,
    )
)
def test_substr_ladder_restriction_is_lossless(docs):
    """The rank-doubling ladder's candidate restriction must lose
    nothing: duplication at 2L implies duplication at L at the same
    position, so re-digesting ONLY the previous level's survivors finds
    exactly the positions a from-scratch scan finds, at every level.
    This is the one claim the DuckDB oracle cannot falsify — both
    engines implement the same restriction."""
    levels = (4, 8, 16)
    surv = None
    for lvl in levels:
        brute = _dup_positions(docs, lvl)
        if surv is not None:
            surv = {(di, p) for di, p in surv if p + lvl <= len(docs[di])}
        ladder = _dup_positions(docs, lvl, candidates=surv)
        assert ladder == brute, (lvl, ladder ^ brute)
        surv = ladder


@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=0, max_value=6),
)
def test_int_ratio_round_formula_is_exact_decimal_half_away(num, den, dec):
    """registry.int_ratio_round_sql's integer formula must equal TRUE
    decimal rounding (half away from zero) of the rational num/den —
    verified against Fraction arithmetic, which float round() cannot
    do. This is the invariant that makes the hardened ratio columns
    engine-agnostic: both engines evaluate the same integer expression,
    and that expression is the mathematically correct decimal round."""
    from fractions import Fraction

    scale = 10**dec
    # Pure-Python mirror of the SQL formula (floor division on the
    # non-negative branch, mirrored for negatives).
    if num >= 0:
        got = (num * 2 * scale + den) // (2 * den)
    else:
        got = -(((-num) * 2 * scale + den) // (2 * den))
    x = Fraction(num, den) * scale
    trunc = int(x)  # toward zero
    away = 1 if x >= 0 else -1
    want = trunc + away if abs(x - trunc) >= Fraction(1, 2) else trunc
    assert got == want, (num, den, dec, got, want)


def test_gear_byte_table_matches_generating_formula():
    """The literal 256-entry gear table the Spark side looks up must be
    exactly the formula the DuckDB oracle evaluates inline — one
    divergent entry silently shifts every downstream boundary."""
    from data_preparation_plugin_spark.plans.dedup import (
        CDC_GEAR_MULT,
        GEAR_BYTE_TABLE,
        _GEAR_REG,
    )

    assert len(GEAR_BYTE_TABLE) == 256
    for b in range(256):
        assert GEAR_BYTE_TABLE[b] == (b * CDC_GEAR_MULT) % _GEAR_REG
