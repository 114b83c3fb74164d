"""Executor-based N → 4N scaling evidence (BASELINE.json north_rule).

The north rule asks for throughput scaling efficiency ≥0.8 between a
cluster of N executors and one of 4N.  `tools/scaling.py` proxies this
with local[8] vs local[32] — but that proxy couples all threads into
ONE JVM heap/GC/shuffle-client, a resource topology no real cluster
has (4N executors bring 4× heaps, 4× GC threads, 4× shuffle clients).

This harness uses Spark's `local-cluster[numExecutors, coresPerExec,
memPerExec]` mode: REAL separate executor JVMs with identical
per-executor resources at both levels — the same contract as adding
executors to a cluster:

    N  = local-cluster[2,4,4096]   (2 executors × 4 cores)
    4N = local-cluster[8,4,4096]   (8 executors × 4 cores)

Protocol mirrors tools/scaling.py: one measured run per fresh
driver+cluster, small-corpus JIT warm-up, 30 s cool-downs, best of 3.

Usage: python tools/scaling_cluster.py [n_convs] [out_json]
"""

import json
import subprocess
import sys
import time

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from gg2rdf_spark.session import build_session
from gg2rdf_spark.pipeline import KGPipeline
from gg2rdf_spark.sources.synthsql import transcripts_sql

n_exec, tr_path = int(sys.argv[1]), sys.argv[2]
evlog_dir = "/tmp/spark-events-scaling"
os.makedirs(evlog_dir, exist_ok=True)
cores_per = int(sys.argv[5]) if len(sys.argv) > 5 else 4
cores = n_exec * cores_per
# shuffle width is a DATA-sizing decision (100-TB principle): identical
# at both cluster sizes when passed explicitly, so the physical plan is
# fixed and only the resources vary (the N->4N contract)
shuffle = int(sys.argv[3]) if len(sys.argv) > 3 and int(sys.argv[3]) else max(cores, 8)
# per-executor memory: identical at both cluster sizes (the N->4N
# contract); sized to the corpus via argv (4g suffices at 200k convs,
# larger corpora need more per-executor heap like any real submission)
mem_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
spark = build_session(
    app_name=f"scale-exec-{n_exec}",
    master=f"local-cluster[{n_exec},{cores_per},{mem_mb}]",
    shuffle_partitions=shuffle,
    extra_conf={
        "spark.executor.memory": f"{mem_mb}m",
        "spark.default.parallelism": str(cores),
        # executors are real separate JVMs: ship the package like a
        # spark-submit --py-files deployment would
        "spark.executorEnv.PYTHONPATH": "/root/repo",
        # a real cluster container is cpu-quota-limited and the JVM
        # sizes JIT/GC/service pools from that quota; local-cluster
        # executors see the whole 32-core box instead, so N JVMs each
        # spawn 32-core-sized service-thread pools (round-4 diagnosis
        # of the 400k-conv 4N inflation).  Pin the JVM's own view to
        # its task cores, as cgroups would:
        "spark.executor.extraJavaOptions":
            f"-XX:ActiveProcessorCount={cores_per} "
            "-Djava.net.preferIPv4Stack=true",
        # a real submission blocks on its requested containers; the
        # sandbox's worker JVMs occasionally fail to launch an
        # executor, which would silently run the "4N" level on fewer
        # executors (round-5 diagnosis of bimodal 4N walls: 129-135 s
        # good mode vs 266/398 s ~= 2x/3x quantized slow runs)
        "spark.scheduler.minRegisteredResourcesRatio": "1.0",
        "spark.scheduler.maxRegisteredResourcesWaitingTime": "120s",
        # event logs so slow runs are post-hoc attributable
        # (straggler task vs executor loss vs box drift)
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file:{evlog_dir}",
    },
)

def live_executors():
    # executor memory status includes the driver's block manager
    return spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

def control_probe():
    # fixed-plan, SINGLE-partition (single-core) pure-JVM probe: one
    # task of xxhash64 over a constant range.  Identical plan at every
    # cluster size, so its wall time indexes the box's current
    # single-stream speed — round-5 event-log diagnosis showed the
    # sandbox box enters minutes-long slow windows (hypervisor steal:
    # identical record counts, JVM CPU-time inflated 4.5x) that poison
    # individual legs of an interleaved pair.  Sized ~3-4 s at nominal
    # box speed: a sub-second probe is dominated by codegen-compile /
    # JIT noise and false-trips the gate (smoke-measured 0.65 vs
    # 0.47 s on a quiet box).  min of 3, after the throwaway warm
    # probe issued post-pipeline-warm-up below: 8 consecutive probes
    # on an otherwise-idle 1-core cluster measured [3.15..4.90] s —
    # individual probes jitter ~1.5x, so a single sample cannot gate
    # at 1.3x; min-of-3 tracks the box's true single-stream speed.
    from pyspark.sql import functions as F
    best = 1e9
    for _ in range(3):
        t = time.time()
        spark.range(0, 1_000_000_000, 1, 1).select(
            F.expr("bit_xor(xxhash64(id)) AS x")).collect()
        best = min(best, time.time() - t)
    return round(best, 3)

def steal_jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal ...
    return int(parts[8]), sum(int(x) for x in parts[1:9])

def bw_probe():
    # single-stream DRAM-bandwidth probe (GB/s, best of 3 copies of a
    # 512 MB buffer).  The xxhash control probe is cache-resident and
    # /proc/stat steal counts stolen CPU, so NEITHER sees a co-tenant
    # saturating the shared memory controllers — a pressure source
    # that taxes the 4-concurrent-JVM leg disproportionately (4
    # streams need 4x the bandwidth of the N leg's 1).  Recorded, not
    # gated: pairs are conditioned on it post-hoc.
    import numpy as np
    a = np.ones(64_000_000, dtype=np.float64)
    b = np.empty_like(a)
    best = 0.0
    for _ in range(3):
        t = time.time()
        np.copyto(b, a)
        best = max(best, 2 * a.nbytes / max(time.time() - t, 1e-9) / 1e9)
    return round(best, 1)

deadline = time.time() + 120
while live_executors() < n_exec and time.time() < deadline:
    time.sleep(1)

# JIT compilation state is PER-JVM: with a fixed warm-up corpus the
# single N-level executor would see n_exec x the per-JVM warm-up the
# 4N executors each get, biasing the pair against 4N.  Scale the
# (untimed) warm-up with executor count so every executor JVM gets
# the same per-JVM coverage — a real cluster's steady state is fully
# JIT'd on every executor.
warm = spark.sql(transcripts_sql(
    f"(SELECT id AS doc_id FROM range({20000 * n_exec}))", dialect="spark"))
KGPipeline(warm).triples().count()
spark.catalog.clearCache()
control_probe()  # throwaway: JIT-warm the probe's own codegen path
# let each executor JVM drain its C2 compile backlog while idle: the
# warm-up enqueues thousands of compilations and a 1-core executor's
# compiler thread shares the task core, so probing (or timing)
# immediately after warm-up measures compile interference, not box
# speed (first 1-core campaign leg: before-probe min-of-3 5.02 s vs
# after-probe 3.23 s, sustained across all three samples)
time.sleep(60)

execs_start = live_executors()
transcripts = spark.read.parquet(tr_path)
ctl_before = control_probe()
bw_before = bw_probe()
st0, tot0 = steal_jiffies()
t0 = time.time()
n = KGPipeline(transcripts).triples().count()
sec = round(time.time() - t0, 3)
st1, tot1 = steal_jiffies()
bw_after = bw_probe()
ctl_after = control_probe()
print("RESULT " + json.dumps(
    {"executors": n_exec, "cores": cores, "sec": sec, "triples": n,
     "execs_start": execs_start, "execs_end": live_executors(),
     "control_before": ctl_before, "control_after": ctl_after,
     "bw_before_gbps": bw_before, "bw_after_gbps": bw_after,
     "steal_frac": round((st1 - st0) / max(tot1 - tot0, 1), 4),
     "t0_ms": int(t0 * 1000), "t1_ms": int((t0 + sec) * 1000),
     "app_id": spark.sparkContext.applicationId}))
spark.stop()
"""


def measure_once(n_exec: int, tr_path: str, shuffle: int = 0,
                 mem_mb: int = 4096, cores_per: int = 4) -> dict:
    cmd = [sys.executable, "-c", RUNNER, str(n_exec), tr_path,
           str(shuffle or 0) or "0", str(mem_mb), str(cores_per)]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def measure_valid(n_exec: int, tr_path: str, shuffle: int = 0,
                  mem_mb: int = 4096, cores_per: int = 4,
                  discarded: list | None = None, retries: int = 2,
                  max_steal: float = 0.01, checkpoint=None) -> dict:
    """measure_once, rejecting runs whose measured window did not hold
    exactly n_exec live executors throughout (a real cluster delivers
    the requested containers; the sandbox's worker JVMs occasionally
    fail to launch or lose one, which is a harness artifact, not a
    property of the pipeline).  Discards are recorded, not hidden."""
    for _ in range(retries + 1):
        r = measure_once(n_exec, tr_path, shuffle, mem_mb, cores_per)
        ctl = sorted([r.get("control_before", 1), r.get("control_after", 1)])
        if r.get("execs_start") != n_exec or r.get("execs_end") != n_exec:
            r["discard_reason"] = (
                f"executors start={r.get('execs_start')} "
                f"end={r.get('execs_end')} != requested {n_exec}")
        elif ctl[1] / max(ctl[0], 1e-9) > 1.4:
            # box changed speed DURING the run (hypervisor steal
            # window): the single-stream control probe bracketing the
            # measured section disagrees with itself.  Threshold 1.4
            # sits between the probe's own idle-box jitter (min-of-3
            # spread well under 1.3) and the slow modes it must catch
            # (2-3x quantized walls, control probes inflated >1.5x)
            r["discard_reason"] = (
                f"box speed changed mid-run: control "
                f"{r['control_before']} -> {r['control_after']}")
        elif r.get("steal_frac", 0.0) > max_steal:
            # a leg that ran under sustained hypervisor steal is a
            # measurement of the co-tenant, not the pipeline: the
            # round-5 400k per-pair attribution showed steal
            # 0.013-0.028 inflating 4N aggregate task time +25%/+59%
            # (GC 157/317 s vs 12-14 s, fetch-wait 68/259 s) while the
            # quiet pair (steal ~0) matched the Amdahl projection at
            # 0.933.  A *consistently* slow leg passes the
            # control-drift gate above (both probes agree — with the
            # thief), so gate on the kernel's own steal counter,
            # SYMMETRICALLY at both cluster sizes.  /proc/stat steal
            # on an idle-neighbor box measures 0.000-0.002; 0.01 sits
            # well above that floor and well below the 0.013+ windows
            # the attribution tied to starved legs.
            r["discard_reason"] = (
                f"sustained hypervisor steal during run: "
                f"steal_frac {r['steal_frac']} > {max_steal}")
        else:
            return r
        print(f"DISCARD {json.dumps(r)}", flush=True)
        if discarded is not None:
            discarded.append(r)
        if checkpoint is not None:
            checkpoint()
        time.sleep(30)
    raise RuntimeError(
        f"{retries + 1} runs at n_exec={n_exec} all invalid")


def measure(n_exec: int, tr_path: str, trials: int = 3,
            shuffle: int = 0, mem_mb: int = 4096,
            cores_per: int = 4) -> dict:
    runs = []
    for _ in range(trials):
        runs.append(measure_once(n_exec, tr_path, shuffle, mem_mb,
                                 cores_per))
        time.sleep(30)
    return {"executors": n_exec, "runs": runs}


def main() -> None:
    """Usage: scaling_cluster.py [n_convs] [out_json] [n_small] [n_big]
    [existing_corpus_dir]

    Default executor counts 1 → 4 (4 → 16 cores): BOTH levels leave
    substantial headroom on the 32-thread sandbox box.  The first
    protocol (2 → 8 executors = 8 → 32 cores) saturated the machine at
    the 4N level — 10 JVMs' GC/service threads + 32 Python workers +
    loopback-TCP shuffle competing for the same 32 hardware threads
    the tasks need — which measures single-box oversubscription, not
    executor scaling (a real cluster's 4N executors bring 4× machines).
    Evidence: single-JVM local[32] runs the same corpus ~2× faster
    than local-cluster[8,4], so the box itself is not the pipeline's
    ceiling; the multi-JVM full-box topology is."""
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_cluster.json"
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_big = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    corpus = sys.argv[5] if len(sys.argv) > 5 and sys.argv[5] != "-" else None
    trials = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    shuffle = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    mem_mb = int(sys.argv[8]) if len(sys.argv) > 8 else 4096
    cores_per = int(sys.argv[9]) if len(sys.argv) > 9 else 4

    sys.path.insert(0, "/root/repo")
    import tempfile

    from gg2rdf_spark.session import build_session
    from gg2rdf_spark.sources.synthsql import transcripts_sql

    if corpus:
        tr_path = corpus
    else:
        tr_path = tempfile.mkdtemp(prefix="scalingc_transcripts_")
        spark = build_session(app_name="scaling-gen", master="local[32]")
        spark.sql(
            transcripts_sql(f"(SELECT id AS doc_id FROM range({n_convs}))",
                            dialect="spark")
        ).repartition(128).write.mode("overwrite").parquet(tr_path)
        spark.stop()
        time.sleep(30)

    factor = n_big / n_small
    # INTERLEAVED pairs (round 4): the sandbox box's absolute
    # throughput drifts by tens of percent across hours (hypervisor
    # neighbors), which poisons a sequential N,N,N,4N,4N,4N protocol —
    # the levels sample different box conditions and their ratio is
    # ill-defined.  Run [N, 4N] back-to-back per trial so each PAIR
    # sees the same box, and report per-pair efficiencies.
    pairs = []
    runsN, runs4N, discarded = [], [], []
    attempts = 0
    corpus_spec = (
        f"transcripts_sql('(SELECT id AS doc_id FROM "
        f"range({n_convs}))', dialect='spark') -> repartition(128) "
        f"-> zstd parquet (seed-free deterministic SQL)"
    )

    def checkpoint() -> None:
        # write the partial record after EVERY pair/discard: a campaign
        # killed mid-flight (session death, OOM, reboot) must not lose
        # the 15-40 min pairs it already completed (the r5b campaign
        # lost a gate-passing pair exactly this way — the only write
        # happened at campaign end).  Same schema as the final record
        # (level keys, triples, corpus_spec) so scaling_merge.py can
        # pool a dead campaign's pairs as-is; the final write below
        # overwrites this with in_progress dropped.
        import statistics as _st
        with open(out_json, "w") as f:
            json.dump({
                "in_progress": True,
                "n_convs": n_convs,
                "triples": runsN[-1]["triples"] if runsN else None,
                f"N_{n_small}x4": {
                    "sec": min((r["sec"] for r in runsN), default=None),
                    "runs": runsN},
                f"{factor:g}N_{n_big}x4": {
                    "sec": min((r["sec"] for r in runs4N), default=None),
                    "runs": runs4N},
                "pair_efficiencies": pairs,
                "scaling_efficiency":
                    round(_st.median(pairs), 3) if pairs else None,
                "scaling_efficiency_estimator":
                    f"median of {len(pairs)} pairs (campaign incomplete)",
                "discarded_runs": discarded,
                "corpus_path": tr_path,
                "corpus_spec": corpus_spec,
            }, f, indent=1)

    while len(pairs) < trials and attempts < trials * 2 + 2:
        attempts += 1
        try:
            a = measure_valid(n_small, tr_path, shuffle, mem_mb, cores_per,
                              discarded, checkpoint=checkpoint)
            time.sleep(30)
            b = measure_valid(n_big, tr_path, shuffle, mem_mb, cores_per,
                              discarded, checkpoint=checkpoint)
        except RuntimeError as exc:
            # a leg's retries all landed in an invalid window; keep the
            # pairs already collected rather than losing hours of runs
            # (zero pairs falls through to the discard-record exit below)
            print(f"ABANDON-ATTEMPT {exc}", flush=True)
            checkpoint()
            break
        time.sleep(30)
        # cross-leg gate: both legs must have seen the same box speed
        # (single-stream control probes within 40% — above the probe's
        # own min-of-3 jitter, below the 2-3x slow modes), else the
        # pair's ratio compares two different machines
        ctl_a = (a["control_before"] + a["control_after"]) / 2
        ctl_b = (b["control_before"] + b["control_after"]) / 2
        if max(ctl_a, ctl_b) / max(min(ctl_a, ctl_b), 1e-9) > 1.4:
            reason = (f"pair legs saw different box speeds: controls "
                      f"N={ctl_a:.2f}s vs {factor:g}N={ctl_b:.2f}s")
            for r in (a, b):
                r["discard_reason"] = reason
                discarded.append(r)
            print(f"DISCARD-PAIR {reason}", flush=True)
            checkpoint()
            continue
        runsN.append(a)
        runs4N.append(b)
        pairs.append(round(a["sec"] / b["sec"] / factor, 3))
        print(f"PAIR {pairs[-1]} N={a['sec']} 4N={b['sec']} "
              f"controls {ctl_a:.2f}/{ctl_b:.2f} "
              f"steal {a['steal_frac']}/{b['steal_frac']} "
              f"bw {a.get('bw_before_gbps')}/{b.get('bw_before_gbps')}",
              flush=True)
        checkpoint()

    if not pairs:
        # every attempt was pair-gated away: still write the record —
        # the discards ARE the result of hours of runs, and losing them
        # to a min()-of-empty crash would defeat the provenance contract
        with open(out_json, "w") as f:
            json.dump({
                "n_convs": n_convs, "pair_efficiencies": [],
                "scaling_efficiency": None,
                "scaling_efficiency_estimator": "no valid pairs",
                "discarded_runs": discarded, "corpus_path": tr_path,
            }, f, indent=1)
        raise SystemExit(
            f"no valid pairs after {attempts} attempts; "
            f"{len(discarded)} discarded runs recorded in {out_json}")

    sN = min(r["sec"] for r in runsN)
    s4N = min(r["sec"] for r in runs4N)
    triples = runsN[-1]["triples"]
    speedup = sN / s4N
    # headline = MEDIAN pair efficiency (round-4 VERDICT/ADVICE): under
    # the box's documented tens-of-percent drift, max-of-pairs is
    # upward-biased by construction — it would eventually print >=0.8
    # on noise alone.  The median of interleaved pairs is
    # drift-robust; the max is kept, labeled as what it is.
    import statistics

    eff = round(statistics.median(pairs), 3)
    result = {
        "n_convs": n_convs, "triples": triples,
        f"N_{n_small}x4": {
            "sec": sN, "triples_per_sec": round(triples / sN, 1),
            "runs": runsN},
        f"{factor:g}N_{n_big}x4": {
            "sec": s4N, "triples_per_sec": round(triples / s4N, 1),
            "runs": runs4N},
        "speedup_N_to_4N": round(speedup, 3),
        "pair_efficiencies": pairs,
        "scaling_efficiency": eff,
        "scaling_efficiency_estimator": f"median of {len(pairs)} pairs",
        "best_pair_efficiency": max(pairs),
        "discarded_runs": discarded,
        "corpus_path": tr_path,
        "corpus_spec": corpus_spec,
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))

    header = (f"Scaling: {n_small} -> {n_big} executors x {cores_per} cores "
              f"(local-cluster, real executor JVMs, {n_convs} convs, FINAL)")
    md = f"""
## {header}

| level | best wall (s) | triples/sec |
|---|---|---|
| N = local-cluster[{n_small},{cores_per},{mem_mb}m] | {sN} | {round(triples / sN, 1)} |
| {factor:g}N = local-cluster[{n_big},{cores_per},{mem_mb}m] | {s4N} | {round(triples / s4N, 1)} |

Speedup {round(speedup, 2)}x over {factor:g}x executors; per-pair
efficiencies {pairs} (N and 4N run back-to-back per pair so both see
the same box conditions — the box's absolute throughput drifts across
hours) -> **scaling efficiency {eff}** (MEDIAN of {len(pairs)} pairs —
drift-robust; best pair {max(pairs)}; target >=0.8).
Per-executor resources
identical at both levels ({cores_per} cores, {mem_mb}m) — the cluster-scaling contract
the single-JVM local[N] proxy cannot represent (one shared heap/GC for
all threads).  Corpus: {triples} triples from {n_convs} conversations;
{len(pairs)} interleaved [N, 4N] pair(s), fresh cluster + JIT warm-up per run,
eager stage-cache materialization, executor JVMs pinned to
-XX:ActiveProcessorCount={cores_per}.  Every timed run verified to hold
exactly the requested executor count start-to-end (a real cluster
submission blocks on its requested containers, matched here with
spark.scheduler.minRegisteredResourcesRatio=1.0) AND to have run at a
consistent box speed: a fixed-plan single-stream JVM control probe
brackets each measured section, and a pair is kept only when all four
probes agree within 40% (ratio <= 1.4, the enforced threshold) AND the
kernel steal counter stays at the idle-neighbor floor (steal_frac <=
0.01; the box enters minutes-long hypervisor-steal windows — identical
record counts with JVM CPU-time inflated ~4.5x, diagnosed from event
logs).  {len(discarded)} invalid run(s) discarded AND recorded in the
JSON — gating is symmetric, so it removes noise in both directions
rather than selecting favorable trials.
Corpus parquet: `{tr_path}` — regenerate bit-for-bit with
`synthsql.transcripts_sql("(SELECT id AS doc_id FROM
range({n_convs}))", dialect="spark")` → `repartition(128)` → zstd
parquet (pure SQL over `range()`; seed-free deterministic).
"""
    from benchmd import replace_section

    replace_section(header, md)


if __name__ == "__main__":
    main()
