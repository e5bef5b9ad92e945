#!/usr/bin/env python
"""Capture .explain("formatted") for named entry queries into text files.

Usage: python tools/capture_plans.py OUTDIR SUFFIX name [name...]
Writes OUTDIR/<name>_<SUFFIX>.txt for each entry, using sf0.01 data (plan
shape is scale-invariant; the driver cannot run Spark and checks claims
against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from helix_db_spark import get_spark
    from helix_db_spark import entry_queries as eq

    spark = get_spark("helix-db-spark-plans",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    registry = eq.queries()

    for name in names:
        if name not in registry:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        df = registry[name](spark, SF_DIR)
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
