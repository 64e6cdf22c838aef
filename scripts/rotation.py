"""CLI wrapper over ``data_preparation_plugin_spark.plans.rotation``.

Since round 9 the slate is computed at package import time
(``plans/__init__.py``), so there is no literal to paste and nothing can
drift. This script remains for inspection: it prints the current slate
and a per-category coverage report (``--categories``) to aim new
operators at genuine gaps.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from data_preparation_plugin_spark.plans.rotation import (  # noqa: E402
    ANCHORS,
    DRIVER_SLOTS,
    PINNED_RECHECKS,
    PRIORITY_DARKS,
    R5_DARK_BACKLOG,
    category_coverage_report,
    compute_slate,
    green_history,
    projected_dark_after_next_round,
)

__all__ = [
    "ANCHORS",
    "DRIVER_SLOTS",
    "PINNED_RECHECKS",
    "PRIORITY_DARKS",
    "R5_DARK_BACKLOG",
    "compute_slate",
    "green_history",
    "category_coverage_report",
    "projected_dark_after_next_round",
]


def main() -> None:
    from data_preparation_plugin_spark import plans

    if "--categories" in sys.argv:
        print(f"{'category':24s} {'registered':>10s} {'in slate':>8s}")
        for cat, n, s in category_coverage_report(
            {n: q.category for n, q in plans.QUERIES.items()}
        ):
            print(f"{cat:24s} {n:10d} {s:8d}")
        return
    print("# computed slate (already live via plans.DRIVER_CHECK_PRIORITY)")
    for name in plans.DRIVER_CHECK_PRIORITY:
        print(name)
    projected = projected_dark_after_next_round(
        list(plans.QUERIES),
        {n: q.category for n, q in plans.QUERIES.items()},
    )
    print(f"# projected driver-dark after next round: {projected}")


if __name__ == "__main__":
    main()
