#!/usr/bin/env python
"""Round-6 probe: does the crawl epoch loop spill, and where?

Runs one pinned local[8] crawl (bench._run_level protocol) with event
logs for each requested arm, then reports per-stage disk/memory spill,
shuffle bytes, and task CPU for the epoch-tagged jobs. Motivated by the
codec A/B (BENCH/codec_ab_r06.json): arms that stop zstd-compressing
spill gained ~30% at local[8], which only makes sense if spills exist.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def stage_spills(evdir: str) -> list[dict]:
    paths = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    if paths and os.path.isdir(paths[-1]):
        paths = sorted(glob.glob(os.path.join(paths[-1], "events_*")),
                       key=lambda p: int(os.path.basename(p).split("_")[1]))
    else:
        paths = paths[-1:]
    agg: dict[int, dict] = {}
    names: dict[int, str] = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si.get("Stage Name", "")[:60]
                elif e == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    tm = ev.get("Task Metrics") or {}
                    a = agg.setdefault(sid, {
                        "mem_spill": 0, "disk_spill": 0, "cpu_s": 0.0,
                        "sh_write": 0, "sh_read": 0, "n_tasks": 0,
                    })
                    a["mem_spill"] += tm.get("Memory Bytes Spilled", 0)
                    a["disk_spill"] += tm.get("Disk Bytes Spilled", 0)
                    a["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                    a["sh_write"] += (tm.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    a["sh_read"] += (sr.get("Local Bytes Read", 0)
                                     + sr.get("Remote Bytes Read", 0))
                    a["n_tasks"] += 1
    rows = []
    for sid, a in sorted(agg.items()):
        rows.append({"stage": sid, "name": names.get(sid, "?"), **{
            k: (round(v, 1) if isinstance(v, float) else v) for k, v in a.items()
        }})
    return rows


def main() -> None:
    arms = {
        "base": "",
        "spill_off": "spark.shuffle.spill.compress=false",
    }
    workdir = "/dev/shm/spillprobe"
    os.makedirs(workdir, exist_ok=True)
    corpus = os.path.join(workdir, "corpus")
    out = {}
    first = True
    for arm, conf in arms.items():
        evdir = os.path.join(workdir, f"ev_{arm}")
        os.makedirs(evdir, exist_ok=True)
        r = bench._run_level(
            corpus, workdir, 8, f"probe_{arm}", gen=first,
            extra_conf=(conf + (";" if conf else "")
                        + f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir};"
                          "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"),
        )
        first = False
        rows = stage_spills(evdir)
        spilling = [x for x in rows if x["disk_spill"] or x["mem_spill"]]
        out[arm] = {
            "urls_per_sec": r["urls_per_sec"], "wall_sec": r["wall_sec"],
            "total_disk_spill_mb": round(sum(x["disk_spill"] for x in rows) / 1e6, 1),
            "total_mem_spill_mb": round(sum(x["mem_spill"] for x in rows) / 1e6, 1),
            "total_cpu_s": round(sum(x["cpu_s"] for x in rows), 1),
            "spilling_stages": spilling[:12],
        }
        print(json.dumps({arm: out[arm]}, indent=1), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
