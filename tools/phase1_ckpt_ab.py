#!/usr/bin/env python
"""Round-5 experiment (r4 verdict task 2): does swapping the politeness
phase-1 cache() for localCheckpoint(eager=False) move the 2->8 crawl
scaling criterion?

Prior evidence says no: round-4's one-big-epoch experiment showed the
criterion residual is proportional task-CPU inflation (memory-hierarchy
contention), not serial driver share — and lineage truncation is a
driver-side lever. This measures the one remaining untried plan lever
so the conclusion is empirical, not inferred.

Protocol: identical corpus, interleaved arms within each rep (box drift
hits both arms), pinned + quiet-gated via bench._run_level, best-of per
(arm, level). Writes BENCH/phase1_ckpt_ab_r05.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/dev/shm/p1ab")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    corpus = os.path.join(args.workdir, "corpus")

    levels = (2, 8)
    arms = {"cache": [], "ckpt": ["--phase1-checkpoint"]}
    samples: dict[str, dict[str, list[dict]]] = {a: {str(n): []} for a in arms for n in levels}
    samples = {a: {str(n): [] for n in levels} for a in arms}
    first = True
    for rep in range(args.reps):
        for n in levels:
            for arm, extra in arms.items():
                r = bench._run_level(
                    corpus, args.workdir, n, f"{arm}{n}_{rep}", gen=first,
                    extra_args=extra,
                )
                first = False
                samples[arm][str(n)].append(
                    {"urls_per_sec": r["urls_per_sec"], "wall_sec": r["wall_sec"],
                     "load1": r["load1_before"]}
                )
    out: dict = {"reps": args.reps, "samples": samples}
    for arm in arms:
        best = {n: max(samples[arm][str(n)], key=lambda s: s["urls_per_sec"]) for n in levels}
        eff = round(best[8]["urls_per_sec"] / best[2]["urls_per_sec"] / 4, 3)
        out[arm] = {
            "urls_per_sec_local2": best[2]["urls_per_sec"],
            "urls_per_sec_local8": best[8]["urls_per_sec"],
            "scaling_efficiency": eff,
        }
    dest = os.path.join(bench.REPO, "BENCH", "phase1_ckpt_ab_r05.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
