"""Extra measurement harness (guide §1.4) — NOT the driver bench.

Isolates each declared query with the noop sink (computes every column,
no output cost) AND with the frozen bench.py action (.count()) so both
views exist; labels jobs; prints one JSON line.

Usage:
    python bench_extra.py [sf_dir] [repeats] [query ...]

bench.py stays FROZEN; cite these numbers in OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])

    import __spark_entry__ as E
    from gg2rdf_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="bench-extra", master=f"local[{cpus}]",
                         shuffle_partitions=max(cpus, 8))
    sc = spark.sparkContext

    out: dict[str, dict] = {}
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        noop_times, count_times = [], []
        for i in range(reps):
            sc.setJobDescription(f"{name} noop#{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_times.append(round(time.time() - t0, 3))
            sc.setJobDescription(f"{name} count#{i}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            count_times.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"noop": noop_times, "count": count_times}
        print(f"## {name}: noop={noop_times} count={count_times}",
              file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
