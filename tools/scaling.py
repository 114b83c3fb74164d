"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands throughput scaling efficiency >=0.8 from N to 4N
executors.  No real cluster exists in this sandbox, so per the driver
instruction we run the SAME job at two parallelism levels —
local[8] (N) and local[32] (4N) — on the same materialized input and
report throughput at both plus efficiency = speedup / 4.

Measurement protocol (each pathology below was MEASURED, round 2):

* One measured run per FRESH JVM.  Repeated in-JVM runs accumulate
  shuffle files + cached-block churn and degraded run-over-run by up
  to 2x; a long-lived session also contaminated per-stage timings
  (isolated stage reruns were 4x faster than in-session ones).
* JIT warm-up on a small (20k-conv) corpus inside the same JVM before
  the measured run, so codegen/C2 compilation doesn't masquerade as
  serial fraction — without re-running the big corpus itself.
* taskset pinning (unpinned local[8] on a 32-core box spills Python
  workers/GC onto idle cores and deflates T_N).
* 30 s cool-down between JVMs (back-to-back JVMs interfere via page
  cache + daemon teardown: measured 3-20x outliers).
* best of 3 independent JVMs per level.

Usage: python tools/scaling.py [n_convs] [out_json]
Appends a markdown section to BENCH.md.
"""

import json
import subprocess
import sys
import time

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from gg2rdf_spark.session import build_session
from gg2rdf_spark.pipeline import KGPipeline
from gg2rdf_spark.sources.synthsql import transcripts_sql

cpus, tr_path = int(sys.argv[1]), sys.argv[2]
# per-core heap must be CONSTANT across levels (the N->4N contract is
# "4x executors bring 4x resources"): a fixed 8g heap starves the 4N
# level of execution memory per task (4x more spill/GC) and deflates
# measured efficiency.  1.5g/core + 4g base, same at both levels.
spark = build_session(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={
                          "spark.driver.memory": f"{4 + (3 * cpus) // 2}g",
                      })
# JIT warm-up on a small corpus: compiles every codegen path + Python
# worker pool without accumulating big-corpus shuffle state
warm = spark.sql(transcripts_sql(
    "(SELECT id AS doc_id FROM range(20000))", dialect="spark"))
KGPipeline(warm).triples().count()
spark.catalog.clearCache()

transcripts = spark.read.parquet(tr_path)
t0 = time.time()
n = KGPipeline(transcripts).triples().count()
print("RESULT " + json.dumps(
    {"cpus": cpus, "sec": round(time.time() - t0, 3), "triples": n}))
spark.stop()
"""


def measure_once(cpus: int, tr_path: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", RUNNER, str(cpus), tr_path],
        capture_output=True, text=True, timeout=3600,
        cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT in output: {out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def measure(cpus: int, tr_path: str, trials: int = 3) -> dict:
    runs = []
    for _ in range(trials):
        runs.append(measure_once(cpus, tr_path))
        time.sleep(30)  # cool-down: let page cache / daemons settle
    return {"cpus": cpus, "runs": runs}


def main() -> None:
    """Usage: scaling.py [n_convs] [out_json] [cpus_small] [cpus_big]
    [existing_corpus_dir]"""
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling.json"
    c_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    c_big = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    corpus = sys.argv[5] if len(sys.argv) > 5 else None

    # materialize the corpus once so both levels read identical input
    sys.path.insert(0, "/root/repo")
    import tempfile

    from gg2rdf_spark.session import build_session
    from gg2rdf_spark.sources.synthsql import transcripts_sql

    if corpus:
        tr_path = corpus
    else:
        tr_path = tempfile.mkdtemp(prefix="scaling_transcripts_")
        spark = build_session(app_name="scaling-gen", master="local[32]")
        spark.sql(
            transcripts_sql(f"(SELECT id AS doc_id FROM range({n_convs}))",
                            dialect="spark")
        ).repartition(128).write.mode("overwrite").parquet(tr_path)
        spark.stop()
        time.sleep(30)

    factor = c_big / c_small
    r8 = measure(c_small, tr_path)
    r32 = measure(c_big, tr_path)

    s8 = min(r["sec"] for r in r8["runs"])
    s32 = min(r["sec"] for r in r32["runs"])
    triples = r8["runs"][-1]["triples"]
    speedup = s8 / s32
    eff = speedup / factor
    result = {
        "n_convs": n_convs,
        "triples": triples,
        f"local{c_small}": {
            "sec": s8, "triples_per_sec": round(triples / s8, 1),
            "runs": r8["runs"]},
        f"local{c_big}": {
            "sec": s32, "triples_per_sec": round(triples / s32, 1),
            "runs": r32["runs"]},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))

    header = (f"Scaling: local[{c_small}] -> local[{c_big}] "
              "(single-JVM proxy, FINAL)")
    md = f"""
## {header}

| level | best wall (s) | triples/sec |
|---|---|---|
| local[{c_small}] (N) | {s8} | {round(triples / s8, 1)} |
| local[{c_big}] ({factor:g}N) | {s32} | {round(triples / s32, 1)} |

Speedup {round(speedup, 2)}x over {factor:g}x cores -> **scaling
efficiency {round(eff, 3)}** (target >=0.8, BASELINE.json north_rule).
Corpus: {triples} triples from a {n_convs}-conversation range()-derived
corpus; best of 3 fresh-JVM runs per level (small-corpus JIT warm-up
inside each JVM, 30 s cool-downs, taskset pinning).
"""
    from benchmd import replace_section

    replace_section(header, md)


if __name__ == "__main__":
    main()
