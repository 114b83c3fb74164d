"""Task-concurrency + task-metric breakdown STRICTLY inside the
measured window of a scaling run (t0_ms..t1_ms from the campaign
JSON), unlike evlog_gaps.py whose job-window heuristic also sweeps
the control probes and inter-probe idle.

For every run recorded in a tools/scaling_cluster.py campaign JSON it
reports, clipped to [t0, t1]:

* wall seconds at each task-concurrency level (conc0 = zero running
  tasks = pure driver/serial time; concK = K tasks in flight), from a
  sweep over TaskEnd launch/finish spans;
* summed task metrics: Executor Run/CPU time, deserialize, GC, result
  serialization, shuffle fetch-wait, shuffle write.

Reading the round-5 1-core campaign (results/
scaling_200k_1core_r5.json) with this tool attributes the ~0.80
median pair efficiency as: 4N legs hold concurrency 4 for ~90% of
wall, zero-task ~4-5%, and the residual is 8-20% AGGREGATE TASK-TIME
INFLATION at 4 executors (sum of Executor Run Time 750-930 s vs
~700 s for the same work at 1 executor) — the cost of shuffle
crossing executor-JVM boundaries plus residual per-stream memory
contention, with GC / fetch-wait / serialization each ~1-2% except in
the one leg that also saw a slow-box window.

Usage: python tools/evlog_window.py <campaign.json> [evlog_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from evlog_gaps import read_lines  # noqa: E402


def analyze(app_dir: str, t0: int, t1: int) -> dict:
    files = sorted(glob.glob(os.path.join(app_dir, "events_*")))
    if not files:
        files = [app_dir]
    spans: list[tuple[int, int]] = []
    agg: dict[str, float] = {
        "run": 0, "cpu": 0, "deser": 0, "gc": 0, "serial": 0,
        "fetchwait": 0, "shufwrite": 0,
    }
    for fp in files:
        for line in read_lines(fp):
            if not line.strip():
                continue
            try:
                e = json.loads(line)
            except (ValueError, UnicodeDecodeError):
                continue
            if e.get("Event") != "SparkListenerTaskEnd":
                continue
            ti = e.get("Task Info", {})
            s, f = ti.get("Launch Time"), ti.get("Finish Time")
            if not (s and f and s < t1 and f > t0):
                continue
            spans.append((max(s, t0), min(f, t1)))
            m = e.get("Task Metrics") or {}
            agg["run"] += m.get("Executor Run Time", 0)
            agg["cpu"] += m.get("Executor CPU Time", 0) / 1e6
            agg["deser"] += m.get("Executor Deserialize Time", 0)
            agg["gc"] += m.get("JVM GC Time", 0)
            agg["serial"] += m.get("Result Serialization Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            agg["fetchwait"] += sr.get("Fetch Wait Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            agg["shufwrite"] += sw.get("Shuffle Write Time", 0) / 1e6

    evts: list[tuple[int, int]] = []
    for s, f in spans:
        if f > s:
            evts.append((s, 1))
            evts.append((f, -1))
    evts.sort()
    conc: dict[int, float] = {}
    cur, last = 0, t0
    for t, d in evts:
        t = min(max(t, t0), t1)
        conc[cur] = conc.get(cur, 0) + (t - last)
        last, cur = t, cur + d
    conc[cur] = conc.get(cur, 0) + (t1 - last)

    out = {"wall_s": round((t1 - t0) / 1000, 1)}
    for k in sorted(conc):
        out[f"conc{k}_s"] = round(conc[k] / 1000, 1)
    for k, v in agg.items():
        out[f"{k}_s"] = round(v / 1000, 1)
    return out


def main() -> None:
    campaign = sys.argv[1]
    evdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-events-scaling"
    runs = json.load(open(campaign))
    for key, level in runs.items():
        if not (isinstance(level, dict) and "runs" in level):
            continue
        for r in level["runs"]:
            app_dir = os.path.join(evdir, f"eventlog_v2_{r['app_id']}")
            if not os.path.exists(app_dir):
                print(key, r["sec"], r["app_id"], "NO EVENT LOG")
                continue
            res = analyze(app_dir, r["t0_ms"], r["t1_ms"])
            print(key, r["sec"], r["app_id"], json.dumps(res))


if __name__ == "__main__":
    main()
