"""Same-box interleaved A/B: cold sf0.1 kg_pipeline with eager stage
caching FORCED ON vs AUTO (off below spark.gg2rdf.eagerCacheMinRows).

Round-4 VERDICT item 4: the eager wave counts are the right trade at
200k+ conversations (they kill the duplicated-lineage super-linear
term) but pure serial overhead at sf0.1 (25k turns), where they sat
inside the cold-bench timed window.  The auto gate (pipeline.py) now
turns them off at toy scale; this harness proves the A/B on one box
with the two modes INTERLEAVED per round (the box drifts across
hours, so A,B,A,B — not A,A,B,B).

Each run is a fresh driver JVM (cold JIT — the same thing bench.py's
cold headline pays).  Usage:

    python tools/abtest_eager.py [sf_dir] [reps] [out_json]
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

mode, sf_dir = sys.argv[1], sys.argv[2]
spark = build_session(app_name=f"abtest-eager-{mode}", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={"spark.gg2rdf.eagerCache": mode})
spark.read.parquet(f"{sf_dir}/documents.parquet") \
    .createOrReplaceTempView("documents")
spark.sql(transcripts_sql("documents", dialect="spark")).write.mode(
    "overwrite").parquet("/tmp/abtest_transcripts")
transcripts = spark.read.parquet("/tmp/abtest_transcripts")
t0 = time.time()
n = KGPipeline(transcripts).triples().count()
print("RESULT " + json.dumps(
    {"mode": mode, "sec": round(time.time() - t0, 3), "triples": n}))
spark.stop()
"""


def run_once(mode: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, mode, sf_dir],
        capture_output=True, text=True, timeout=1200, cwd="/root/repo")
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/abtest_eager.json"

    runs = {"true": [], "auto": []}
    for _ in range(reps):
        for mode in ("true", "auto"):  # interleaved: each rep same box
            runs[mode].append(run_once(mode, sf_dir))
            time.sleep(15)
    result = {
        "sf_dir": sf_dir,
        "cold_sec": {m: [r["sec"] for r in rs] for m, rs in runs.items()},
        "best": {m: min(r["sec"] for r in rs) for m, rs in runs.items()},
        "triples": runs["auto"][0]["triples"],
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
