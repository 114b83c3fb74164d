"""Fused-run stage timeline via Spark event log.

Runs the full pipeline once at a given core count with
spark.eventLog.enabled, then parses the event JSON into a stage
timeline: wall span, task time, max task, scheduling gaps — the
decisive view of where the non-scaling seconds live (stage-isolated
profiles distort by persisting every stage).

Usage: python tools/evlog_profile.py <corpus_dir> [cpus]
"""

import glob
import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from gg2rdf_spark.session import build_session
from gg2rdf_spark.pipeline import KGPipeline
from gg2rdf_spark.sources.synthsql import transcripts_sql

cpus, tr_path, evdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = build_session(app_name=f"evlog-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={
                          "spark.driver.memory": f"{4 + (3 * cpus) // 2}g",
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.dir": evdir,
                      })
warm = spark.sql(transcripts_sql(
    "(SELECT id AS doc_id FROM range(20000))", dialect="spark"))
KGPipeline(warm).triples().count()
spark.catalog.clearCache()
transcripts = spark.read.parquet(tr_path)
t0 = time.time()
n = KGPipeline(transcripts).triples().count()
print("RESULT " + json.dumps({"sec": round(time.time() - t0, 3), "n": n}))
spark.stop()
"""


def main() -> None:
    tr_path = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import shutil

    evdir = "/tmp/evlog"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(evdir + "/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    r = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", RUNNER, str(cpus), tr_path, evdir],
        capture_output=True, text=True, timeout=1800, cwd="/root/repo",
    )
    print([ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")])

    logs = sorted(glob.glob(evdir + "/*"), key=os.path.getmtime)
    latest = logs[-1]
    if os.path.isdir(latest):  # rolling event log (eventlog_v2_*)
        files = sorted(glob.glob(os.path.join(latest, "events*")))
    else:
        files = [latest]
    lines = []
    for p in files:
        with open(p) as f:
            lines.extend(f)
    stages = {}
    t_first = None
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None:
                    continue
                if t_first is None or sub < t_first:
                    t_first = sub
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "sub": sub, "comp": comp,
                    "wall": (comp - sub) / 1000.0,
                    "tasks": si["Number of Tasks"],
                }
    # sort by submission; compute gap to previous completion
    order = sorted(stages.values(), key=lambda s: s["sub"])
    prev_comp = None
    total_wall = 0.0
    total_gap = 0.0
    print(f"{'stage':62s} {'tasks':>5s} {'wall':>7s} {'gap':>6s}")
    for s in order:
        gap = (s["sub"] - prev_comp) / 1000.0 if prev_comp else 0.0
        gap = max(gap, 0.0)
        total_gap += gap
        total_wall += s["wall"]
        print(f"{s['name']:62s} {s['tasks']:5d} {s['wall']:7.2f} {gap:6.2f}")
        prev_comp = max(prev_comp or 0, s["comp"])
    print(f"stage-wall sum {total_wall:.1f}s  inter-stage gap sum "
          f"{total_gap:.1f}s  stages {len(order)}")


if __name__ == "__main__":
    main()
