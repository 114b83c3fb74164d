"""Per-stage scaling profile: time each pipeline stage at local[8] and
local[32] (pinned), inputs persisted+materialized so each measurement
isolates one stage.

Usage: python tools/stage_profile.py [n_convs]
"""

import json
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from gg2rdf_spark.session import build_session
from gg2rdf_spark.operators import assemble as A, extract as E
from gg2rdf_spark.operators import serialize as S, triples as T

cpus, tr_path = int(sys.argv[1]), sys.argv[2]
spark = build_session(app_name=f"prof-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
tr = spark.read.parquet(tr_path)
out = {}

def stage(name, df):
    t0 = time.time()
    df = df.persist()
    n = df.count()
    out[name] = round(time.time() - t0, 2)
    return df

tr = stage("read", tr)
m = stage("parse", E.parse_mentions(tr))
docs = stage("docs", E.docs_frame(tr, m))
tt = stage("tt", E.treatment_taxon(m))
convs = stage("conv_bundles", A.conv_frame(docs, tt))
cits = stage("citation_frame", A.citation_frame(m, docs, tt))
fold = stage("citation_fold", A.citation_fold(cits, convs))
figs = stage("figures", A.figure_frame(m))
mats = stage("materials", A.material_frame(m, convs))
verns = stage("verns", A.vernacular_frame(m))
trp = stage("assembly", T.triples_frame(convs, cits, fold, figs, mats, verns))
print("RESULT " + json.dumps({"cpus": cpus, "stages": out}))
spark.stop()
"""


def measure(cpus: int, tr_path: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", RUNNER, str(cpus), tr_path],
        capture_output=True, text=True, timeout=3600, cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    sys.path.insert(0, "/root/repo")
    import tempfile

    from gg2rdf_spark.session import build_session
    from gg2rdf_spark.sources.synthsql import transcripts_sql

    tr_path = tempfile.mkdtemp(prefix="prof_transcripts_")
    spark = build_session(app_name="prof-gen", master="local[32]")
    spark.sql(
        transcripts_sql(f"(SELECT id AS doc_id FROM range({n_convs}))",
                        dialect="spark")
    ).repartition(128).write.mode("overwrite").parquet(tr_path)
    spark.stop()

    r8 = measure(8, tr_path)
    r32 = measure(32, tr_path)
    rows = []
    for k in r8["stages"]:
        s8, s32 = r8["stages"][k], r32["stages"][k]
        rows.append((k, s8, s32, round(s8 / s32, 2) if s32 else 0))
    print(f"{'stage':18s} {'8thr':>7s} {'32thr':>7s} {'speedup':>8s}")
    for k, a, b, sp in rows:
        print(f"{k:18s} {a:7.2f} {b:7.2f} {sp:8.2f}")
    print(json.dumps({"local8": r8, "local32": r32}))


if __name__ == "__main__":
    main()
