"""Per-stage attribution for one registered query (guide §1/§7.1).

Runs the query once against the noop sink (after a tiny-scale warmup)
and dumps the top stages by executor run time from the live UI REST API
— executor-run-time, task counts, input/shuffle record counts. The
mapping back to operators goes through the SQL tab / the committed
``plans/<round>/`` explain files.

Usage:
    python scripts/opt_profile.py query_name [top_n]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    name = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_preparation_plugin_spark import get_spark, plans

    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    builder = plans.QUERIES[name].builder

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(builder(spark, "/root/testdata/sf0.001"))  # warmup: JVM/codegen
    # Stage ids from the warmup overlap the profile dump; record the
    # boundary so only timed-run stages are attributed.
    first_timed_job = int(
        spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    )
    t0 = time.perf_counter()
    run(builder(spark, sf_dir))
    print(f"wall {time.perf_counter() - t0:.2f}s (single shot, {sf_dir})")

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    )
    timed_stages = {
        sid
        for j in jobs
        if j["jobId"] >= first_timed_job
        for sid in j["stageIds"]
    }
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    rows = sorted(
        (
            (
                s["executorRunTime"],
                s["stageId"],
                s["numCompleteTasks"],
                s["inputRecords"],
                s["shuffleReadRecords"],
                s["shuffleWriteRecords"],
                s["name"].split("\n")[0][:70],
            )
            for s in stages
            if s["stageId"] in timed_stages
        ),
        reverse=True,
    )
    for r in rows[:top_n]:
        print(
            f"run={r[0] / 1000:8.2f}s stage={r[1]:4d} tasks={r[2]:3d} "
            f"in={r[3]:10d} sr={r[4]:10d} sw={r[5]:10d} {r[6]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
