"""Interleaved same-session A/B of the staged_vectors scan fan-out.

Today's host drifts ×1.7 between "clean" windows minutes apart, so
sequential A-then-B measurements are not comparable (SCALE.md §0; the
r16 continuation session measured the same committed plan at 1.80s and
3.99s best-of-3 half an hour apart at <1% steal). This harness
alternates variants WITHIN one Spark session — A,B,A,B,... reps — so
both variants see the same drift, and reports per-variant minima.

Variant toggle: ``plans.similarity.parallelize_scan`` is the only
fan-out hook in similarity.py; rebinding it to identity disables the
fan-out for every staged_vectors caller at builder-call time.

Usage: python scripts/opt_ab_fanout.py [--reps 4] name1 name2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from data_preparation_plugin_spark import get_spark, plans
    from data_preparation_plugin_spark.plans import similarity as sim

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-fanout")
    spark.sparkContext.setLogLevel("ERROR")

    fan = sim.parallelize_scan
    nofan = lambda df: df  # noqa: E731

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in args.names:
        builder = plans.QUERIES[name].builder
        # Warm both variants once at tiny scale.
        for v in (fan, nofan):
            sim.parallelize_scan = v
            run(builder(spark, "/root/testdata/sf0.001"))
        t: dict[str, list[float]] = {"fan": [], "nofan": []}
        for _ in range(args.reps):
            for label, v in (("fan", fan), ("nofan", nofan)):
                sim.parallelize_scan = v
                t0 = time.perf_counter()
                run(builder(spark, sf_dir))
                t[label].append(round(time.perf_counter() - t0, 3))
        sim.parallelize_scan = fan
        out[name] = {
            "fan_min": min(t["fan"]),
            "nofan_min": min(t["nofan"]),
            "fan": t["fan"],
            "nofan": t["nofan"],
        }
        print(
            f"{name}: fan={min(t['fan']):.2f} nofan={min(t['nofan']):.2f}"
            f"  fan_all={t['fan']} nofan_all={t['nofan']}",
            flush=True,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
