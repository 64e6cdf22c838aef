"""Optimization-round measurement harness (guide §1).

Times individual registered queries in isolation against the noop sink
(best-of-N plus the cold first rep) and/or dumps ``explain("formatted")``
to ``plans/<round>/<query>_<tag>.txt`` so plan claims are auditable.

Usage:
    python scripts/opt_measure.py --reps 3 name1 name2 ...
    python scripts/opt_measure.py --explain before name1 ...
    python scripts/opt_measure.py --explain after --no-time name1 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), OPT_ROUND (r16).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--explain",
        metavar="TAG",
        help="dump explain('formatted') to plans/<round>/<name>_<TAG>.txt",
    )
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from data_preparation_plugin_spark import get_spark, plans

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_tag = os.environ.get("OPT_ROUND", "r16")
    spark = get_spark(app_name="dpp-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in args.names:
        builder = plans.QUERIES[name].builder
        if args.explain:
            plan_dir = Path(__file__).resolve().parent.parent / "plans" / round_tag
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = builder(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{args.explain}.txt").write_text(text)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt:{name}")
        if not args.no_warmup:
            run(builder(spark, "/root/testdata/sf0.001"))
        best = float("inf")
        first = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run(builder(spark, sf_dir))
            dt = time.perf_counter() - t0
            first = dt if first is None else first
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": round(best, 3), "first": round(first, 3)}
        print(f"{name}: best={best:.3f} first={first:.3f}", flush=True)

    if out:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
