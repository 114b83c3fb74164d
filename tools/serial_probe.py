"""Probe the serial (non-scaling) component of the fused pipeline run.

T(n) = S + P/n fitted from local[8]/local[32] gives S ≈ 49 s — half the
32-thread wall.  Candidates: Catalyst optimization of the big DAG
(driver, serial), AQE re-planning per stage boundary (driver, serial),
scheduler gaps, cache materialization barriers.  This probe times the
SAME corpus at local[32] under config variants, one fresh JVM each.

Usage: python tools/serial_probe.py <corpus_dir> [variant ...]
Variants: base aqe_off bigparts nocache
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

variant, tr_path = sys.argv[1], sys.argv[2]
cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
extra = {"spark.driver.memory": f"{4 + (3 * cpus) // 2}g"}
shuffle = max(cpus, 8)
if variant == "aqe_off":
    extra["spark.sql.adaptive.enabled"] = "false"
elif variant == "coalesce_off":
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
elif variant == "cof_parts3x":
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    shuffle = 3 * cpus
elif variant == "bigparts":
    extra["spark.sql.shuffle.partitions"] = "64"
elif variant == "nobroadcast":
    extra["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    extra["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
cache = variant != "nocache"
eager = variant == "eager"
spark = build_session(app_name=f"probe-{variant}", master=f"local[{cpus}]",
                      shuffle_partitions=shuffle, extra_conf=extra)
warm = spark.sql(transcripts_sql(
    "(SELECT id AS doc_id FROM range(20000))", dialect="spark"))
KGPipeline(warm, cache=cache).triples().count()
spark.catalog.clearCache()

transcripts = spark.read.parquet(tr_path)
t0 = time.time()
n = KGPipeline(transcripts, cache=cache, eager=eager).triples().count()
print("RESULT " + json.dumps(
    {"variant": variant, "sec": round(time.time() - t0, 3), "triples": n}))
spark.stop()
"""


def main() -> None:
    """Each variant arg is ``name`` (local[32]) or ``name@cpus``
    (pinned to that many cores)."""
    tr_path = sys.argv[1]
    variants = sys.argv[2:] or ["base", "aqe_off", "bigparts", "nocache"]
    out = {}
    for spec in variants:
        v, _, c = spec.partition("@")
        cpus = int(c) if c else 32
        r = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, "-c", RUNNER, v, tr_path, str(cpus)],
            capture_output=True, text=True, timeout=1800, cwd="/root/repo",
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                out[spec] = json.loads(line[len("RESULT "):])
                break
        else:
            out[spec] = {"error": r.stdout[-800:] + r.stderr[-800:]}
        print(json.dumps({spec: out[spec]}))
        time.sleep(20)
    print("ALL " + json.dumps(out))


if __name__ == "__main__":
    main()
