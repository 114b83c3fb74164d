"""Per-stage executor-metric profile of a local-cluster pipeline run.

Diagnoses WHERE multi-executor runs lose time: for every stage it
aggregates, from the Spark event log's TaskEnd metrics —

  wall        stage wall span (submission -> completion)
  taskT       sum of task durations (launch -> finish)
  runT        sum of Executor Run Time
  cpuT        sum of Executor CPU Time (JVM-side cycles only)
  gcT         sum of JVM GC Time              <- heap-pressure signal
  fetchW      sum of shuffle Fetch Wait Time  <- shuffle-transfer stall
  spillM/D    memory/disk bytes spilled       <- execution-memory signal
  shR/shW     shuffle bytes read/written
  maxT        slowest task duration           <- straggler signal

Unlike tools/evlog_profile.py (single-JVM local[N] stage timeline),
this runs under local-cluster[n,cores,mem] — real executor JVMs — so
the numbers describe the exact configuration the N->4N scaling
harness (tools/scaling_cluster.py) measures.

Usage:
  python tools/evlog_cluster.py <corpus_dir> <n_exec> [mem_mb] \
      [shuffle] [out_json]
"""

import glob
import json
import os
import shutil
import subprocess
import sys
from collections import defaultdict

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from gg2rdf_spark.session import build_session
from gg2rdf_spark.pipeline import KGPipeline
from gg2rdf_spark.sources.synthsql import transcripts_sql

n_exec, tr_path, evdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
shuffle = int(sys.argv[4])
mem_mb = int(sys.argv[5])
cores = n_exec * 4
spark = build_session(
    app_name=f"evlogc-{n_exec}",
    master=f"local-cluster[{n_exec},4,{mem_mb}]",
    shuffle_partitions=shuffle,
    extra_conf={
        "spark.executor.memory": f"{mem_mb}m",
        "spark.default.parallelism": str(cores),
        "spark.executorEnv.PYTHONPATH": "/root/repo",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        # local-cluster executors get no cgroup cpu limit, so each JVM
        # sizes JIT/GC/service pools for the WHOLE box (32 cores); a
        # real cluster container is quota-limited and the JVM honors
        # it.  Emulate that contract explicitly:
        "spark.executor.extraJavaOptions":
            "-XX:ActiveProcessorCount=4 -Djava.net.preferIPv4Stack=true",
    },
)
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


def parse_evlog(evdir: str) -> list[dict]:
    logs = sorted(glob.glob(evdir + "/*"), key=os.path.getmtime)
    latest = logs[-1]
    if os.path.isdir(latest):
        files = sorted(glob.glob(os.path.join(latest, "events*")))
    else:
        files = [latest]

    stages: dict[int, dict] = {}
    agg: dict[int, dict] = defaultdict(lambda: defaultdict(float))

    def read_lines(p):
        if p.endswith(".zstd"):
            import pyarrow as pa

            with open(p, "rb") as f:
                raw = pa.input_stream(
                    pa.BufferReader(f.read()), compression="zstd").read()
            return raw.decode("utf-8", "replace").splitlines()
        with open(p) as f:
            return f.read().splitlines()

    for p in files:
        if True:
            for line in read_lines(p):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    if si.get("Submission Time") is None:
                        continue
                    stages[si["Stage ID"]] = {
                        "id": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:48],
                        "sub": si["Submission Time"],
                        "comp": si["Completion Time"],
                        "wall": (si["Completion Time"]
                                 - si["Submission Time"]) / 1000.0,
                        "tasks": si["Number of Tasks"],
                    }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info") or {}
                    tm = ev.get("Task Metrics") or {}
                    a = agg[sid]
                    dur = (ti.get("Finish Time", 0)
                           - ti.get("Launch Time", 0)) / 1000.0
                    a["taskT"] += dur
                    a["maxT"] = max(a["maxT"], dur)
                    a["runT"] += tm.get("Executor Run Time", 0) / 1000.0
                    a["cpuT"] += tm.get("Executor CPU Time", 0) / 1e9
                    a["gcT"] += tm.get("JVM GC Time", 0) / 1000.0
                    a["deserT"] += (
                        tm.get("Executor Deserialize Time", 0) / 1000.0)
                    a["spillM"] += tm.get("Memory Bytes Spilled", 0)
                    a["spillD"] += tm.get("Disk Bytes Spilled", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    a["shR"] += (sr.get("Remote Bytes Read", 0)
                                 + sr.get("Local Bytes Read", 0))
                    a["fetchW"] += sr.get("Fetch Wait Time", 0) / 1000.0
                    sw = tm.get("Shuffle Write Metrics") or {}
                    a["shW"] += sw.get("Shuffle Bytes Written", 0)
                    inm = tm.get("Input Metrics") or {}
                    a["inB"] += inm.get("Bytes Read", 0)
    rows = []
    for sid, s in stages.items():
        s.update({k: v for k, v in agg[sid].items()})
        rows.append(s)
    rows.sort(key=lambda s: s["sub"])
    return rows


def mb(x: float) -> str:
    return f"{x / 1048576:.0f}M" if x else "0"


def report(rows: list[dict]) -> dict:
    tot = defaultdict(float)
    print(f"{'stage':50s}{'tk':>4s}{'wall':>8s}{'taskT':>8s}{'gcT':>7s}"
          f"{'fetchW':>7s}{'maxT':>7s}{'spillD':>8s}{'shR':>7s}{'shW':>7s}")
    for s in rows:
        for k in ("wall", "taskT", "runT", "cpuT", "gcT", "fetchW",
                  "deserT", "spillM", "spillD", "shR", "shW", "inB"):
            tot[k] += s.get(k, 0.0)
        if s["wall"] < 0.75 and s.get("gcT", 0) < 1:
            continue
        print(f"{s['name']:50s}{s['tasks']:4d}{s['wall']:8.1f}"
              f"{s.get('taskT', 0):8.1f}{s.get('gcT', 0):7.1f}"
              f"{s.get('fetchW', 0):7.1f}{s.get('maxT', 0):7.1f}"
              f"{mb(s.get('spillD', 0)):>8s}{mb(s.get('shR', 0)):>7s}"
              f"{mb(s.get('shW', 0)):>7s}")
    print(
        f"TOTALS wall={tot['wall']:.0f}s taskT={tot['taskT']:.0f}s "
        f"runT={tot['runT']:.0f}s cpuT={tot['cpuT']:.0f}s "
        f"gcT={tot['gcT']:.0f}s fetchW={tot['fetchW']:.0f}s "
        f"deserT={tot['deserT']:.0f}s spillM={mb(tot['spillM'])} "
        f"spillD={mb(tot['spillD'])} shR={mb(tot['shR'])} "
        f"shW={mb(tot['shW'])} input={mb(tot['inB'])}")
    return dict(tot)


def main() -> None:
    corpus = sys.argv[1]
    n_exec = int(sys.argv[2])
    mem_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 7168
    shuffle = int(sys.argv[4]) if len(sys.argv) > 4 else n_exec * 4 * 2
    out_json = sys.argv[5] if len(sys.argv) > 5 else ""

    evdir = f"/tmp/evlogc_{n_exec}"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(evdir + "/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    r = subprocess.run(
        [sys.executable, "-c", RUNNER, str(n_exec), corpus, evdir,
         str(shuffle), str(mem_mb)],
        capture_output=True, text=True, timeout=3600, cwd="/root/repo",
    )
    res = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    print(res or r.stdout[-1500:] + r.stderr[-1500:])
    rows = parse_evlog(evdir)
    tot = report(rows)
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"result": res, "totals": tot, "stages": rows}, f)


if __name__ == "__main__":
    main()
