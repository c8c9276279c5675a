#!/usr/bin/env python3
"""Mini-driver: run each __spark_entry__ query and its DuckDB oracle
side-by-side, compare row count + order-insensitive values (columns sorted
by name, floats as-is). Usage: python tools/check_queries.py [sf_dir] [names...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def norm_cell(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (SparkSession.builder.master("local[8]")
             .appName("check-queries")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem events "
                 "documents embeddings").split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (rows-only, no oracle)  {t1-t0:.1f}s")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        a = canon([tuple(r) for r in srows], scols)
        b = canon(drows, dcols)
        ok = a == b and sorted(scols) == sorted(dcols)
        status = "OK " if ok else "FAIL"
        print(f"{name:24s} {status} spark={len(srows):6d} duck={len(drows):6d}  {t1-t0:.1f}s")
        if not ok:
            failures += 1
            if sorted(scols) != sorted(dcols):
                print(f"   cols spark={sorted(scols)} duck={sorted(dcols)}")
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            print(f"   spark-only: {diff_a}")
            print(f"   duck-only:  {diff_b}")
    print("FAILURES:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
