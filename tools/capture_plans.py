"""Capture .explain('formatted') for every declared query → plans/r06/.

Usage: python tools/capture_plans.py <suffix: before|after> [sf_dir] [query ...]

Writes plans/r06/<query>_<suffix>.txt for each query (all by default).
Pipeline-backed queries build the shared _PIPE_CACHE once (same as the
driver does), so their plans show the persisted-stage InMemoryRelations
they really execute against.
"""

import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    import __spark_entry__ as E
    from gg2rdf_spark.session import build_session

    spark = build_session(app_name=f"plans-{suffix}", master="local[32]",
                          shuffle_partitions=32)
    outdir = "/root/repo/plans/r06"
    os.makedirs(outdir, exist_ok=True)

    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR capturing plan: {ex}"
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
