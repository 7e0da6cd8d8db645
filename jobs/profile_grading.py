#!/usr/bin/env python
"""Profile a simulated driver grading pass (sf0.01): per-query Spark wall
+ DuckDB oracle wall, in registry order. Output: JSON lines to stdout.

Usage: python jobs/profile_grading.py [sf_dir]
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

    spark = get_spark(app_name="profile-grading", cores=32, shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    t_all = time.time()
    rows = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            pdf = fn(spark, SF).toPandas()
            spark_s = time.time() - t0
            nrows = len(pdf)
            err = None
        except Exception as exc:  # noqa: BLE001
            spark_s = time.time() - t0
            nrows = -1
            err = str(exc)[:200]
        t1 = time.time()
        duck_s = 0.0
        if name in sqls and err is None:
            try:
                con.execute(sqls[name]).df()
                duck_s = time.time() - t1
            except Exception as exc:  # noqa: BLE001
                duck_s = time.time() - t1
                err = "oracle: " + str(exc)[:200]
        rec = {"q": name, "spark_s": round(spark_s, 2), "duck_s": round(duck_s, 2),
               "rows": nrows, "err": err}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    total = time.time() - t_all
    rows.sort(key=lambda r: -(r["spark_s"] + r["duck_s"]))
    print(json.dumps({"total_s": round(total, 1),
                      "top10": [(r["q"], r["spark_s"], r["duck_s"]) for r in rows[:10]]}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
