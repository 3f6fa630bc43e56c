#!/usr/bin/env python
"""Dump .explain("formatted") for bench headliners to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plans.py <outdir> <suffix> [query ...]
Defaults to every bench.py headliner at $SPARK_GRAFT_SF_DIR (sf0.1).
Construction side effects (eager localCheckpoints in opic/retrieve_topk)
do run; only the plan text is captured, no query action."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402

def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench
        names = bench.HEADLINERS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=16)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok")
    spark.stop()

if __name__ == "__main__":
    main()
