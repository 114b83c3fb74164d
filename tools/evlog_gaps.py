"""Task-concurrency / driver-gap timeline from a Spark event log.

Answers the Amdahl question for the N->4N scaling runs: of the
measured wall time, how much had ZERO running tasks (pure
driver/serial time: plan compilation, broadcast collect+build, job
scheduling), and how much ran at each task-concurrency level?  At 4N
the same serial seconds cost 4x the efficiency they cost at N, so
this is the first place to look when a pair efficiency stalls below
target.

Works on the logs written by tools/scaling_cluster.py runs
(spark.eventLog.dir=/tmp/spark-events-scaling, one dir per app_id —
each RESULT line records its app_id).

Usage:
  python tools/evlog_gaps.py <evlog_dir_or_app_dir> [--from-job N]

With --from-job, the window starts at that job's submission (use it
to skip the JIT warm-up jobs, which share the app log; the scaling
RUNNER's warm-up is every job before the longest inter-job gap, the
default heuristic).
"""

import glob
import json
import os
import sys


def read_lines(path: str):
    if path.endswith(".zstd"):
        import pyarrow as pa

        with open(path, "rb") as f:
            buf = f.read()
        stream = pa.input_stream(pa.BufferReader(buf), compression="zstd")
        data = stream.read().decode("utf-8", "replace")
    else:
        with open(path, errors="replace") as f:
            data = f.read()
    for line in data.splitlines():
        if line.strip():
            yield line


def load_events(app_dir: str) -> list[dict]:
    paths = sorted(glob.glob(os.path.join(app_dir, "events_*")))
    if not paths:
        paths = [app_dir] if os.path.isfile(app_dir) else sorted(
            glob.glob(os.path.join(app_dir, "*")))
    events = []
    for p in paths:
        if os.path.basename(p) == "appstatus":
            continue
        for line in read_lines(p):
            try:
                events.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return events


def analyze(app_dir: str, from_job: int | None = None,
            window_ms: tuple[int, int] | None = None) -> dict:
    events = load_events(app_dir)
    jobs = {}           # job id -> (submit, complete)
    tasks = []          # (launch, finish) ms
    job_of_stage = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = [e["Submission Time"], None]
            for sid in e.get("Stage IDs", []):
                job_of_stage[sid] = e["Job ID"]
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]][1] = e["Completion Time"]
        elif ev == "SparkListenerTaskEnd":
            info = e.get("Task Info", {})
            if info and not info.get("Failed", False):
                tasks.append((info["Launch Time"], info["Finish Time"],
                              job_of_stage.get(e.get("Stage ID"), -1)))

    done = sorted((j, s, c) for j, (s, c) in jobs.items() if c)
    if not done:
        return {"error": "no completed jobs"}
    if window_ms is not None:
        # exact epoch-ms window (the scaling RUNNER's t0_ms/t1_ms):
        # restrict to jobs submitted inside it
        done = [(j, s, c) for j, s, c in done
                if s >= window_ms[0] and s <= window_ms[1]]
        if not done:
            return {"error": "no jobs in window"}
        from_job = done[0][0]
    if from_job is None:
        # warm-up boundary = the longest gap between consecutive jobs
        gaps = [(done[i + 1][1] - done[i][2], done[i + 1][0])
                for i in range(len(done) - 1)]
        from_job = max(gaps)[1] if gaps and max(gaps)[0] > 2000 else done[0][0]
    window = [(j, s, c) for j, s, c in done if j >= from_job]
    w0, w1 = window[0][1], max(c for _, _, c in window)

    # sweep: concurrency histogram over the measured window
    edges = []
    for lt, ft, jid in tasks:
        if jid >= from_job and ft > w0:
            edges.append((max(lt, w0), 1))
            edges.append((min(ft, w1), -1))
    edges.sort()
    hist = {}  # concurrency -> ms
    cur, prev = 0, w0
    for t, d in edges:
        if t > prev:
            hist[cur] = hist.get(cur, 0) + (t - prev)
            prev = t
        cur += d
    if w1 > prev:
        hist[0] = hist.get(0, 0) + (w1 - prev)
    wall = w1 - w0
    zero = hist.get(0, 0)
    return {
        "app": os.path.basename(app_dir),
        "window_jobs": [j for j, _, _ in window],
        "wall_sec": round(wall / 1000, 2),
        "zero_task_sec": round(zero / 1000, 2),
        "zero_task_frac": round(zero / wall, 3),
        "concurrency_sec": {
            str(k): round(v / 1000, 2) for k, v in sorted(hist.items())},
        "mean_concurrency": round(
            sum(k * v for k, v in hist.items()) / wall, 2),
        "inter_job_gaps_sec": [
            round((window[i + 1][1] - window[i][2]) / 1000, 2)
            for i in range(len(window) - 1)],
    }


def main() -> None:
    app_dir = sys.argv[1]
    from_job = None
    window = None
    if len(sys.argv) > 3 and sys.argv[2] == "--from-job":
        from_job = int(sys.argv[3])
    elif len(sys.argv) > 4 and sys.argv[2] == "--window":
        window = (int(sys.argv[3]), int(sys.argv[4]))
    print(json.dumps(analyze(app_dir, from_job, window), indent=2))


if __name__ == "__main__":
    main()
