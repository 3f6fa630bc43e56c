#!/usr/bin/env python
"""Per-query timing harness for optimization work (guide §1.4).

Times individual __spark_entry__ queries with the SAME methodology as
the frozen bench.py (construction inside the window, noop sink,
best-of-N passes) but for an arbitrary query subset, so a single
query can be iterated on without re-running the whole suite. bench.py
stays the only artifact the driver measures; numbers from this file
are cited in OPTIMIZATION_r06.md as isolation evidence only.

Usage: python bench_extra.py [query ...]       # default: all headliners
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_PASSES (2)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
PASSES = int(os.environ.get("BENCH_EXTRA_PASSES", "2"))


def main() -> None:
    import __spark_entry__ as entrymod
    from crawlspark.session import get_spark

    import bench

    names = sys.argv[1:] or list(bench.HEADLINERS)
    spark = get_spark("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2)
    qs = entrymod.queries()
    # same warmup control as bench.py so codegen/JIT is hot
    bench._control_time(spark)
    passes: list[dict[str, float]] = []
    controls: list[float] = []
    for _ in range(PASSES):
        controls.append(bench._control_time(spark))
        t: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"bench-extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
        passes.append(t)
    timings = {k: min(p[k] for p in passes) for k in names}
    spark.stop()
    print(json.dumps({"queries": timings, "sf": SF_DIR, "passes": PASSES,
                      "controls": controls, "load1": round(os.getloadavg()[0], 2),
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
