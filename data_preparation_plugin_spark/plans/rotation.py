"""Compute the round's 50-slot driver-check slate from CORRECTNESS history.

The round driver oracle-checks only the first 50 names in
``plans.QUERIES``, so which queries occupy those slots decides which rows
can turn driver-green this round. This module derives the slate from
data instead of a hand-kept literal (which drifted in rounds 5, 7 and 8):

1. **Anchors** — multi-round-green regression canaries, one per fragile
   category, always re-checked.
2. **Driver-dark queries** — every registered query with no green row in
   any committed ``CORRECTNESS_r*.json`` (newly registered queries are
   dark by construction, so they join the slate automatically).
3. **Stalest fills** — remaining slots go to the queries whose most
   recent green row is oldest, with category coverage as an invariant.

``plans/__init__.py`` calls :func:`compute_slate` at import time, so the
slate is always the pure function of (registry, committed history) —
landing a new CORRECTNESS file rotates it automatically and can never
strand a stale literal. ``python scripts/rotation.py`` prints the same
slate for inspection.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DRIVER_SLOTS = 50

#: Multi-round-green canaries, one per fragile category. Keep short: every
#: anchor slot is a slot a dark query can't use.
ANCHORS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q12_priority_by_linestatus",
    "join_asof",
    "events_stream_tumbling",
    "geo_point_in_region",
    "curation_corpus_status",
    "sink_merge_upsert",
]


#: Queries that were already driver-dark when round 5 closed (the
#: VERDICT's enumerated backlog). They outrank darks registered later:
#: a row that has waited rounds for its first driver check beats one
#: registered yesterday with fresh local parity.
R5_DARK_BACKLOG = frozenset(
    {
        "agg_cms_heavy_hitters",
        "agg_kmv_distinct",
        "agg_kmv_union",
        "curation_adaptive_threshold",
        "dedup_duplicate_spans",
        "events_ewma_smooth",
        "events_mad_outliers",
        "events_stream_merge_totals",
        "events_watermark_audit",
        "graph_triangle_cooccurrence",
        "join_interval_overlap",
        "knn_pq_adc",
        "layout_zorder_bucket",
        "profile_table_columns",
        "sample_balanced_labels",
        "sample_length_batches",
        "sample_token_budget",
        "sample_weighted_reservoir",
        "sink_dynamic_partition_overwrite",
        "source_binaryfile_ingest",
        "text_bigram_logprob",
        "text_quality_classifier",
        "transform_cdc_apply",
        "udf_cogroup_views_before_purchase",
    }
)


def green_history(root: str = REPO_ROOT) -> dict[str, int]:
    """Map query name -> most recent round with a green driver row.

    A row is green when the value hashes matched, or — for the weaker
    rows-only check the driver applies to oracle-less queries — when the
    row counts matched.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        match = re.search(r"r(\d+)", os.path.basename(path))
        if not match:
            continue
        rnd = int(match.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, res in rows.items():
            ok = res.get("hash_match") or (
                res.get("hash_match") is None and res.get("rows_match")
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_slate(
    registered: list[str],
    categories: dict[str, str] | None = None,
    root: str = REPO_ROOT,
    slots: int = DRIVER_SLOTS,
) -> list[str]:
    """The slate: anchors, all driver-dark queries, then stalest fills.

    When ``categories`` (name -> category) is given, fills first cover
    every category missing from the slate so far (stalest query of each
    missing category), keeping ``test_first_slots_cover_every_category``
    an invariant; remaining slots go to the globally stalest rows.
    Orderings are fully sorted (dark: alphabetical; fills: by last-green
    round then name) so the result is a pure function of
    (registry, committed history).
    """
    latest = green_history(root)
    anchors = [n for n in ANCHORS if n in registered]
    dark = sorted(
        (n for n in registered if n not in latest and n not in anchors),
        key=lambda n: (n not in R5_DARK_BACKLOG, n),
    )
    core = anchors + dark
    fills = sorted(
        (n for n in registered if n in latest and n not in core),
        key=lambda n: (latest[n], n),
    )
    cat_fills: list[str] = []
    if categories:
        # Category coverage is a hard invariant
        # (test_first_slots_cover_every_category): when the dark set
        # alone overflows the budget, coverage fills EVICT tail dark
        # queries from the window — evicted darks stay registered, stay
        # dark, and re-enter at the head of next round's slate.
        all_cats = {categories[n] for n in registered if n in categories}
        while True:
            visible = core[: slots - len(cat_fills)] + cat_fills
            uncovered = sorted(
                all_cats - {categories[n] for n in visible if n in categories}
            )
            if not uncovered:
                break
            for cat in uncovered:
                pick = next(
                    (
                        n
                        for n in fills
                        if categories.get(n) == cat and n not in cat_fills
                    ),
                    None,
                )
                if pick is None:
                    return (visible + [n for n in fills if n not in visible])[
                        :slots
                    ]
                cat_fills.append(pick)
    head = core[: slots - len(cat_fills)] + cat_fills
    rest = [n for n in core if n not in head] + [
        n for n in fills if n not in head
    ]
    return (head + rest)[:slots]


def category_coverage_report(
    registered: dict[str, str], root: str = REPO_ROOT
) -> list[tuple[str, int, int]]:
    """(category, n_registered, n_in_slate) rows, sparsest first.

    A design aid (VERDICT r8 #8): before adding round-N operators, see
    which categories are under-represented so new work lands in genuine
    gaps instead of duplicating covered ground.
    """
    slate = set(compute_slate(list(registered), registered, root=root))
    cats: dict[str, list[int]] = {}
    for name, cat in registered.items():
        row = cats.setdefault(cat, [0, 0])
        row[0] += 1
        row[1] += name in slate
    return sorted(
        ((c, n, s) for c, (n, s) in cats.items()), key=lambda r: (r[0],)
    )
