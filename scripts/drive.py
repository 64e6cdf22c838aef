"""Drive the driver contract: compare declared queries vs oracles at sf0.01.

Usage:
    python scripts/drive.py              # entry smoke + ALL queries
    python scripts/drive.py name1 name2  # entry smoke + just these
    SPARK_GRAFT_TEST_SF_DIR=... python scripts/drive.py

Mirrors the round driver's comparison (column-name sort, row sort, float
normalization) by reusing the tests/conftest.py helpers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
os.environ["SPARK_GRAFT_TEST_SF_DIR"] = SF


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from data_preparation_plugin_spark import get_spark, plans
    from tests.conftest import duckdb_result, spark_result

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rows = entry_mod.entry(spark).collect()
    print(f"entry: {len(rows)} rows", flush=True)

    con = duckdb.connect()
    for t in plans.registry.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    names = sys.argv[1:] or list(plans.QUERIES)
    failed = []
    for name in names:
        q = plans.QUERIES[name]
        t0 = time.time()
        try:
            s_cols, s_rows = spark_result(q.builder(spark, SF))
            if q.oracle is None:
                print(f"  {name}: rows-only ({len(s_rows)} rows)", flush=True)
                continue
            d_cols, d_rows = duckdb_result(con, q.oracle)
            ok = s_cols == d_cols and s_rows == d_rows
            n_bad = (
                0
                if ok
                else sum(1 for a, b in zip(s_rows, d_rows) if a != b)
                + abs(len(s_rows) - len(d_rows))
            )
            status = "OK " if ok else f"FAIL ({n_bad} bad)"
            print(
                f"  {name}: {status} {len(s_rows)} rows"
                f" [{time.time() - t0:.1f}s]",
                flush=True,
            )
            if not ok:
                failed.append(name)
                if s_cols != d_cols:
                    print(f"    cols: {s_cols} vs {d_cols}")
                for a, b in list(zip(s_rows, d_rows))[:3]:
                    if a != b:
                        print(f"    spark  {a}\n    oracle {b}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"  {name}: ERROR {type(exc).__name__}: {exc}", flush=True)
    print(f"{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
