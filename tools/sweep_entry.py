#!/usr/bin/env python
"""Fresh-session scaling sweep for registry entries (PLANS.md protocol).

Usage: python tools/sweep_entry.py ENTRY[,ENTRY...] SF_DIR[,SF_DIR...]
       [--reps N]

For every (entry, sf_dir) pair this spawns a FRESH python/JVM process
(the r9 measurement-hygiene rule: multi-entry sessions only rank
suspects — persisted frames and GC debt from earlier entries pollute
exponents), runs one untimed warm pass plus `--reps` timed passes with
a clearCache+System.gc fence between them, and prints one line per pair:

    entry sf_dir best_sec reps=[...] rows=N

The exponent between two dirs 10x apart is log10(t_big/t_small).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from helix_db_spark import get_spark
from helix_db_spark import entry_queries as eq
spark = get_spark("sweep", **{{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
fn = eq.queries()[{entry!r}]
def fence():
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
rows = fn(spark, {sf!r}).count()          # untimed warm + row count
reps = []
for _ in range({reps}):
    fence()
    t0 = time.perf_counter()
    fn(spark, {sf!r}).write.format("noop").mode("overwrite").save()
    reps.append(round(time.perf_counter() - t0, 3))
print(json.dumps({{"rows": rows, "reps": reps}}))
"""


def main() -> None:
    argv = sys.argv[1:]
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]  # drop the flag AND its value
    args = [a for a in argv if not a.startswith("--")]
    entries = args[0].split(",")
    sf_dirs = args[1].split(",")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for entry in entries:
        for sf in sf_dirs:
            code = _CHILD.format(repo=repo, entry=entry, sf=sf, reps=reps)
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True)
            # strip BEFORE the truthiness check: whitespace-only stdout
            # is truthy but splits to [], and the [-1] must not raise
            # outside the try (ADVICE r10 — it crashed the whole sweep)
            stdout = out.stdout.strip() if out.stdout else ""
            line = stdout.splitlines()[-1] if stdout else ""
            try:
                res = json.loads(line)
                print(f"{entry} {sf} {min(res['reps']):.3f}s "
                      f"reps={res['reps']} rows={res['rows']}", flush=True)
            except (ValueError, IndexError):
                print(f"{entry} {sf} FAILED\n{out.stderr[-800:]}",
                      flush=True)


if __name__ == "__main__":
    main()
