#!/usr/bin/env python
"""Driver-style correctness check: run every __spark_entry__.queries() entry
at sf0.01 and compare against its oracle_sql() via DuckDB — row count, sorted
column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    import duckdb

    import __spark_entry__ as e

    if "--vanilla" in sys.argv:
        # mimic the grading driver exactly: a bare session with NONE of our
        # builder confs — proves the contract surface is session-portable
        sys.argv.remove("--vanilla")
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("oracle-check-vanilla")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
    else:
        from helix_db_spark import get_spark
        spark = get_spark("oracle-check",
                          **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_fail = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"rows {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(osql[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} != {sorted(d_cols)}")
        if not problems:
            hs, hd = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
            if hs != hd:
                problems.append(f"hash {hs} != {hd}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
