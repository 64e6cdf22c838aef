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
3. **Stalest fills** — remaining SPARE slots (if any) first cover every
   category missing from the slate, then go to the queries whose most
   recent green row is oldest. Coverage is conditional on spare slots —
   it never evicts a dark query
   (``test_first_slots_cover_every_category_or_drain_backlog``).

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

#: Multi-round-green canaries. Keep short: every anchor slot is a slot a
#: dark query can't use. Round 11 (VERDICT r10 #1) cut this from 8 to 3 —
#: one relational, one streaming, one physical-sink — because the dark
#: backlog (80 queries) overflows the 50-slot budget and anchors were
#: eating drain capacity.
ANCHORS = [
    "q1_pricing_summary",
    "events_stream_tumbling",
    "sink_merge_upsert",
]

#: Already-green queries pinned into the slate for a specific re-check the
#: judge asked for (VERDICT r10 #6: exercise the bitemporal correction
#: stripe under the driver — its only green row predates the r8 fix that
#: made corrections survive). Pinned rows sit right after the anchors.
PINNED_RECHECKS = [
    "join_bitemporal_asof",
]

#: Driver-dark queries the judge named as highest-risk (VERDICT r10 #2):
#: stateful-streaming state protocol, physical sink round trips, leakage
#: rules. They take the first dark slots regardless of registration age.
PRIORITY_DARKS = [
    "events_stream_tws_bucketed",
    "events_stream_tws_profile",
    "events_stream_tws_timer_sessions",
    "sink_kept_corpus_export",
    "sink_scd2_merge_apply",
    "split_leakage_audit",
    "events_training_set_pit",
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

    When ``categories`` (name -> category) is given and SPARE slots
    remain after anchors + pins + darks, fills first cover every
    category missing from the slate so far (stalest query of each
    missing category), then remaining spare slots go to the globally
    stalest rows. Coverage is capped at the true spare capacity, so it
    can never evict a dark query — draining darks outranks re-checking
    an already-green row (VERDICT r10 #1; see
    ``test_first_slots_cover_every_category_or_drain_backlog``).
    Orderings are fully sorted (dark: alphabetical; fills: by last-green
    round then name) so the result is a pure function of
    (registry, committed history).
    """
    latest = green_history(root)
    anchors = [n for n in ANCHORS if n in registered]
    pinned = [
        n for n in PINNED_RECHECKS if n in registered and n not in anchors
    ]
    dark = sorted(
        (
            n
            for n in registered
            if n not in latest and n not in anchors and n not in pinned
        ),
        key=lambda n: (
            n not in PRIORITY_DARKS,
            PRIORITY_DARKS.index(n) if n in PRIORITY_DARKS else 0,
            n not in R5_DARK_BACKLOG,
            n,
        ),
    )
    core = anchors + pinned + dark
    fills = sorted(
        (n for n in registered if n in latest and n not in core),
        key=lambda n: (latest[n], n),
    )
    cat_fills: list[str] = []
    spare = slots - len(core)
    if categories and spare > 0:
        # Category coverage applies only to SPARE slots: when the dark
        # backlog alone overflows the budget (rounds 9-11), draining darks
        # outranks re-checking an already-green query for coverage — a
        # dark row is the only kind that can never have regressed because
        # it has never been measured (VERDICT r10 #1). Coverage fills are
        # hard-capped at the spare capacity so they can never shrink the
        # core window and evict a dark query (ADVICE r11).
        all_cats = {categories[n] for n in registered if n in categories}
        unfillable: set[str] = set()
        while len(cat_fills) < spare:
            covered = {
                categories[n] for n in core + cat_fills if n in categories
            }
            uncovered = sorted(all_cats - covered - unfillable)
            if not uncovered:
                break
            pick = next(
                (
                    n
                    for n in fills
                    if categories.get(n) == uncovered[0]
                    and n not in cat_fills
                ),
                None,
            )
            if pick is None:
                # Every member of this category is dark (already in core)
                # — nothing green exists to fill with; skip it.
                unfillable.add(uncovered[0])
                continue
            cat_fills.append(pick)
    head = core + cat_fills
    rest = [n for n in fills if n not in head]
    return (head + rest)[:slots]


def projected_dark_after_next_round(
    registered: list[str],
    categories: dict[str, str] | None = None,
    root: str = REPO_ROOT,
    slots: int = DRIVER_SLOTS,
) -> int:
    """How many registered queries stay driver-dark even if every slated
    dark goes green next round.

    VERDICT r10 #8: registration velocity must stay gated on verification
    capacity — ``test_projected_dark_backlog_bounded`` fails the build when
    this exceeds 50, forcing any new registration to come with a drain
    plan instead of silently compounding the backlog.
    """
    latest = green_history(root)
    slate = set(compute_slate(registered, categories, root=root, slots=slots))
    return sum(1 for n in registered if n not in latest and n not in slate)


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
