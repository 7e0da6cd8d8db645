#!/usr/bin/env python
"""Driver-mirror oracle sweep: run EVERY registry query on Spark and its
DuckDB oracle at the given scale (default sf0.01 — the driver's grading
scale) and compare rows / schema / dtypes / values exactly as
``tests/test_queries_vs_duckdb.py`` does at sf0.001. One JSON line per
query, a summary line at the end.

Usage: python jobs/sweep_oracle.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb

    import __spark_entry__ as entry
    from crawler_spark.session import get_spark
    # Single source of truth for the comparison: import the pytest
    # module's _compare/_norm so this sweep can never drift from the
    # in-repo parity suite.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_queries_vs_duckdb import _compare

    spark = get_spark(app_name="sweep-oracle", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, sqls = entry.queries(), entry.oracle_sql()
    t_all = time.time()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF).toPandas()
            odf = con.execute(sqls[name]).df()
            _compare(name, sdf, odf)
            rec = {"q": name, "ok": True, "rows": len(sdf),
                   "s": round(time.time() - t0, 2)}
            n_pass += 1
        except Exception as exc:  # noqa: BLE001
            rec = {"q": name, "ok": False, "err": str(exc)[:300],
                   "s": round(time.time() - t0, 2)}
            n_fail += 1
        print(json.dumps(rec, ensure_ascii=False), flush=True)
    print(json.dumps({"sf": SF, "pass": n_pass, "fail": n_fail,
                      "total_s": round(time.time() - t_all, 1)}), flush=True)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
