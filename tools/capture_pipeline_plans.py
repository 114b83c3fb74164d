"""Capture plans for the bench.py-timed paths that are not declared
queries: kg_pipeline (triples frame), kg_status (status frame),
kg_transcripts_gen (the corpus derivation SQL).

Usage: python tools/capture_pipeline_plans.py <suffix> [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from gg2rdf_spark.pipeline import KGPipeline
    from gg2rdf_spark.session import build_session
    from gg2rdf_spark.sources.synthsql import transcripts_sql

    spark = build_session(app_name=f"pipe-plans-{suffix}", master="local[32]",
                          shuffle_partitions=32)
    outdir = "/root/repo/plans/r06"
    os.makedirs(outdir, exist_ok=True)

    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    gen = spark.sql(transcripts_sql("documents", dialect="spark"))
    with open(f"{outdir}/kg_transcripts_gen_{suffix}.txt", "w") as f:
        f.write(_fmt(gen))

    # same shape bench.py uses: write + read back
    tmp = tempfile.mkdtemp(prefix="plan_transcripts_")
    gen.write.mode("overwrite").parquet(tmp)
    transcripts = spark.read.parquet(tmp)
    pipe = KGPipeline(transcripts)
    with open(f"{outdir}/kg_pipeline_{suffix}.txt", "w") as f:
        f.write(_fmt(pipe.triples()))
    with open(f"{outdir}/kg_status_{suffix}.txt", "w") as f:
        f.write(_fmt(pipe.status()))
    print("done")
    spark.stop()


if __name__ == "__main__":
    main()
