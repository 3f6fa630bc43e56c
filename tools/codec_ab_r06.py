#!/usr/bin/env python
"""Round-6 experiment: the last untried crawl-epoch lever from the r5
verdict ("reduce per-URL bytes through the memory hierarchy — spill
codec / staged-write dictionary A/B").

Arms, all interleaved within each rep so box drift hits every arm:

  base         current defaults (spark.io.compression.codec=zstd,
               parquet snappy staged write, spill compress on)
  io_lz4       spark.io.compression.codec=lz4 — re-checks the adopted
               zstd shuffle/broadcast codec on the current plan shape
  pq_zstd      spark.sql.parquet.compression.codec=zstd — smaller
               staged-write bytes for more encode CPU
  spill_off    spark.shuffle.spill.compress=false — null hypothesis:
               the epoch loop should not spill at bench corpus size,
               so any delta is noise; acts as a built-in control

Protocol: identical corpus, pinned + quiet-gated via bench._run_level,
best-of-R per (arm, level), levels 2 and 8 (the criterion pair).
Writes BENCH/codec_ab_r06.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

ARMS = {
    "base": "",
    "io_lz4": "spark.io.compression.codec=lz4",
    "pq_zstd": "spark.sql.parquet.compression.codec=zstd",
    "spill_off": "spark.shuffle.spill.compress=false",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/dev/shm/codecab")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", default="2,8")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    corpus = os.path.join(args.workdir, "corpus")
    levels = tuple(int(x) for x in args.levels.split(","))

    samples: dict[str, dict[str, list[dict]]] = {
        a: {str(n): [] for n in levels} for a in ARMS
    }
    first = True
    for rep in range(args.reps):
        for n in levels:
            for arm, conf in ARMS.items():
                r = bench._run_level(
                    corpus, args.workdir, n, f"{arm}_{n}_{rep}",
                    gen=first, extra_conf=conf,
                )
                first = False
                samples[arm][str(n)].append({
                    "urls_per_sec": r["urls_per_sec"],
                    "wall_sec": r["wall_sec"],
                    "load1": r["load1_before"],
                })
                print(f"rep{rep} local[{n}] {arm}: "
                      f"{r['urls_per_sec']:.0f} urls/s (load1 {r['load1_before']})",
                      file=sys.stderr)

    out: dict = {"samples": samples}
    for arm in ARMS:
        best = {
            n: max(samples[arm][str(n)], key=lambda s: s["urls_per_sec"])
            for n in levels
        }
        row = {f"urls_per_sec_local{n}": round(best[n]["urls_per_sec"], 2)
               for n in levels}
        if len(levels) == 2 and all(x in levels for x in (2, 8)):
            row["eff_2_8"] = round(
                best[8]["urls_per_sec"] / best[2]["urls_per_sec"] / 4, 3
            )
        out[arm] = row
    path = os.path.join(bench.REPO, "BENCH", "codec_ab_r06.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
