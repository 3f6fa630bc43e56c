#!/usr/bin/env python
"""Round-4 scaling experiments (verdict items #3 and #4).

Three questions, each answered with pinned, quiet-gated, interleaved
runs via bench._run_level (identical protocol to bench.py):

A. Did disabling AQE cause the r3 local[32] collapse (83k -> 47k
   urls/s), or was it the documented box-oversubscription wave?
   -> interleaved AQE-off / AQE-on triplets at local[32], same corpus.

B. Is the 2->8 criterion residual (0.747 vs 0.8) the per-epoch SERIAL
   driver share, or PROPORTIONAL task-time inflation? r3 measured the
   efficiency as corpus-size-invariant, which argues proportional; the
   one untried protocol lever is ONE big epoch (all pages seeded,
   max_epochs=1): it halves the serial share per crawled URL while
   keeping the plan identical. If efficiency jumps -> serial; if flat
   -> proportional, and the discharge is arithmetic (experiment C).

C. Event-log decomposition at the criterion pair: total task CPU time
   and slot occupancy for the TAGGED epoch jobs only (see
   epoch.py crawl-epoch-N job descriptions). Efficiency factors as
     eff = (CPU_2/CPU_8) x (occ_8/occ_2)
   so measured CPU inflation at 8 threads bounds the efficiency any
   plan can reach on this box.

Usage:  python tools/scaling_ab.py [--workdir DIR] [--skip a,b,c]
Writes one JSON blob to stdout and to <workdir>/scaling_ab.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (the bench protocol: pinning, quiet-gating)


def _best(samples: list[dict]) -> dict:
    return max(samples, key=lambda r: r["urls_per_sec"])


def exp_a_aqe_local32(corpus: str, workdir: str, reps: int = 3) -> dict:
    out = {"aqe_off": [], "aqe_on": []}
    for rep in range(reps):
        # interleave off/on within each sweep: box drift hits both arms
        r_off = bench._run_level(corpus, workdir, 32, f"a_off_{rep}", gen=False)
        out["aqe_off"].append({"urls_per_sec": r_off["urls_per_sec"],
                               "wall_sec": r_off["wall_sec"],
                               "load1": r_off["load1_before"]})
        r_on = bench._run_level(
            corpus, workdir, 32, f"a_on_{rep}", gen=False,
            extra_conf="spark.sql.adaptive.enabled=true;"
                       "spark.sql.adaptive.coalescePartitions.enabled=false",
        )
        out["aqe_on"].append({"urls_per_sec": r_on["urls_per_sec"],
                              "wall_sec": r_on["wall_sec"],
                              "load1": r_on["load1_before"]})
    out["best_off"] = _best(out["aqe_off"])["urls_per_sec"]
    out["best_on"] = _best(out["aqe_on"])["urls_per_sec"]
    out["on_vs_off"] = round(out["best_on"] / out["best_off"], 3)
    return out


def exp_b_one_big_epoch(workdir: str, reps: int = 2) -> dict:
    """All pages seeded, max_epochs=1: same plan, half the per-URL
    serial share. Efficiency at the criterion pair vs the 2-epoch
    protocol answers serial-vs-proportional."""
    corpus = os.path.join(workdir, "corpus_1ep")
    out = {"2": [], "8": []}
    for rep in range(reps):
        for cpus in (2, 8):
            r = bench._run_level(
                corpus, workdir, cpus, f"b{cpus}_{rep}",
                gen=(rep == 0 and cpus == 2), max_epochs=1,
                gen_seeds=bench.CRAWL_PAGES,  # every page seeded: one big epoch
            )
            out[str(cpus)].append({"urls_per_sec": r["urls_per_sec"],
                                   "wall_sec": r["wall_sec"],
                                   "load1": r["load1_before"]})
    b2, b8 = _best(out["2"]), _best(out["8"])
    sp = b8["urls_per_sec"] / b2["urls_per_sec"]
    return {**out, "speedup": round(sp, 3), "scaling_efficiency": round(sp / 4, 3)}


# _parse_eventlog moved into bench.py (round 5) so the per-round bench
# decomposes the criterion pair itself; keep the old name as an alias.
_parse_eventlog = bench._parse_eventlog


def exp_d_pairs_decomposed(corpus: str, workdir: str, reps: int = 2,
                           levels=(1, 2, 4, 8)) -> dict:
    """The round-4 criterion experiment: every level gets an event-log-
    decomposed run x reps (interleaved across levels so box drift hits
    all arms), then each N->4N pair is scored three ways:
      wall efficiency      = (urls/s at 4N) / (urls/s at N) / 4
      cpu_inflation        = task CPU-seconds at 4N / at N  (same work,
                             so >1 is pure memory-hierarchy contention —
                             hardware, unreachable by any plan)
      occupancy ratio      = slot occupancy at 4N / at N    (scheduling
                             gaps + stage tails — the software share
                             that transfers to real multi-executor runs)
    best-of-reps per level by urls/s; decomposition taken from the best
    run's log."""
    out: dict = {str(n): [] for n in levels}
    for rep in range(reps):
        for n in levels:
            evdir = os.path.join(workdir, f"evlog_d{n}_{rep}")
            os.makedirs(evdir, exist_ok=True)
            r = bench._run_level(
                corpus, workdir, n, f"d{n}_{rep}", gen=False,
                extra_conf=(
                    f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir};"
                    "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"
                ),
            )
            out[str(n)].append({
                "urls_per_sec": r["urls_per_sec"], "wall_sec": r["wall_sec"],
                "load1": r["load1_before"], **_parse_eventlog(evdir, n),
            })
    best = {n: _best(out[str(n)]) for n in levels}
    pairs = {}
    for lo in levels:
        hi = lo * 4
        if hi not in best:
            continue
        b_lo, b_hi = best[lo], best[hi]
        p = {"urls_per_sec": (b_lo["urls_per_sec"], b_hi["urls_per_sec"]),
             "wall_efficiency": round(b_hi["urls_per_sec"] / b_lo["urls_per_sec"] / 4, 3)}
        if b_lo.get("cpu_s") and b_hi.get("cpu_s"):
            p["cpu_inflation"] = round(b_hi["cpu_s"] / b_lo["cpu_s"], 3)
            if b_lo.get("occupancy") and b_hi.get("occupancy"):
                p["occupancy_ratio"] = round(b_hi["occupancy"] / b_lo["occupancy"], 3)
        pairs[f"{lo}->{hi}"] = p
    return {"levels": out, "best": {str(k): v for k, v in best.items()}, "pairs": pairs}


def exp_c_eventlog_pair(corpus: str, workdir: str) -> dict:
    out = {}
    for cpus in (2, 8):
        evdir = os.path.join(workdir, f"evlog{cpus}")
        os.makedirs(evdir, exist_ok=True)
        r = bench._run_level(
            corpus, workdir, cpus, f"c{cpus}", gen=False,
            extra_conf=(
                f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir};"
                "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"
            ),
        )
        out[str(cpus)] = {
            "urls_per_sec": r["urls_per_sec"], "wall_sec": r["wall_sec"],
            "load1": r["load1_before"], **_parse_eventlog(evdir, cpus),
        }
    c2, c8 = out["2"], out["8"]
    if c2.get("cpu_s") and c8.get("cpu_s"):
        out["cpu_inflation_2_to_8"] = round(c8["cpu_s"] / c2["cpu_s"], 3)
        if c2.get("occupancy") and c8.get("occupancy"):
            out["eff_bound_from_decomposition"] = round(
                (c2["cpu_s"] / c8["cpu_s"]) * (c8["occupancy"] / c2["occupancy"]), 3
            )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/dev/shm/crawlbench_ab")
    ap.add_argument("--skip", default="", help="comma list of a,b,c to skip")
    ap.add_argument("--reps-a", type=int, default=3)
    ap.add_argument("--reps-b", type=int, default=2)
    args = ap.parse_args()
    skip = set(args.skip.split(","))
    os.makedirs(args.workdir, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", os.path.join(args.workdir, "spark_local"))
    os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    corpus = os.path.join(args.workdir, "corpus")
    results: dict = {"corpus_pages": bench.CRAWL_PAGES}
    if "gen" not in skip:  # generation run (also the corpus warmer)
        gen = bench._run_level(corpus, args.workdir, 8, "gen", gen=True)
        results["gen_run_local8"] = {"urls_per_sec": gen["urls_per_sec"],
                                     "load1": gen["load1_before"]}

    if "c" not in skip:
        results["c_eventlog_pair"] = exp_c_eventlog_pair(corpus, args.workdir)
        _dump(args.workdir, results)
    if "d" not in skip:
        results["d_pairs_decomposed"] = exp_d_pairs_decomposed(corpus, args.workdir)
        _dump(args.workdir, results)
    if "a" not in skip:
        results["a_aqe_local32"] = exp_a_aqe_local32(corpus, args.workdir, args.reps_a)
        _dump(args.workdir, results)
    if "b" not in skip:
        results["b_one_big_epoch"] = exp_b_one_big_epoch(args.workdir, args.reps_b)
        _dump(args.workdir, results)
    print(json.dumps(results, indent=2))


def _dump(workdir: str, results: dict) -> None:
    with open(os.path.join(workdir, "scaling_ab.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
