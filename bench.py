"""Benchmark harness (driver-run per round → BENCH_r{N}.json).

Headline: the full KG-construction pipeline (parse → bundles → fold →
assemble → dedup) at $SPARK_GRAFT_SF_DIR, reported as wall seconds
plus derived triples/sec (BASELINE.json metric).  Side queries cover
the other operator families (TPC-H-ish aggregates/joins, MinHash LSH
dedup, brute-force ANN, text quality).

Prints ONE JSON line:
  {"metric": "kg_pipeline_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "triples": N, "triples_per_sec": N, "cpus": N}

Scaling evidence (local[8] vs local[32]) is produced separately by
tools/scaling.py → BENCH.md (BASELINE.json north_rule: efficiency
≥0.8 from N→4N).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from gg2rdf_spark.pipeline import KGPipeline
    from gg2rdf_spark.session import build_session
    from gg2rdf_spark.sources.synthsql import transcripts_sql

    spark = build_session(
        app_name="gg2rdf-bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    queries: dict[str, float] = {}

    # -- corpus generation (engine-side, measured separately) -----------
    tmp = tempfile.mkdtemp(prefix="bench_transcripts_")
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    t0 = time.time()
    spark.sql(transcripts_sql("documents", dialect="spark")) \
        .write.mode("overwrite").parquet(tmp)
    queries["kg_transcripts_gen"] = round(time.time() - t0, 3)

    transcripts = spark.read.parquet(tmp)
    n_turns = transcripts.count()

    # -- headline: full KG pipeline -------------------------------------
    t0 = time.time()
    pipe = KGPipeline(transcripts)
    n_triples = pipe.triples().count()
    kg_sec = time.time() - t0
    queries["kg_pipeline"] = round(kg_sec, 3)

    t0 = time.time()
    pipe.status().count()
    queries["kg_status"] = round(time.time() - t0, 3)

    # -- side queries ---------------------------------------------------
    for name in ("tpch_q1", "tpch_q3", "dedup_minhash_lsh",
                 "ann_bruteforce", "text_quality", "dedup_exact",
                 "canon_cc"):
        fn = E.queries()[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "kg_pipeline_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_turns": n_turns,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / kg_sec, 1),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
