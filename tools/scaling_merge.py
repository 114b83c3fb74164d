"""Merge scaling_cluster.py campaign JSONs into one pair list + robust
statistics.

Campaigns are collected in separate invocations (the box's quiet
windows are scattered across hours); the north-rule headline must be a
robust statistic over ALL gated pairs, not whichever single campaign
looked best.  This tool concatenates the per-pair efficiencies of
every input file, recomputes median / min / max / count, carries the
discard lists through, and (with -o) writes the combined record.

Usage: python tools/scaling_merge.py a.json b.json [...] [-o out.json]
"""

import json
import statistics
import sys


def merge(paths: list[str]) -> dict:
    pairs: list[float] = []
    discards = 0
    per_file = {}
    n_convs = None
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        pe = d.get("pair_efficiencies", [])
        pairs.extend(pe)
        discards += len(d.get("discarded_runs", []))
        per_file[p] = {"pairs": pe,
                       "estimator": d.get("scaling_efficiency_estimator")}
        if n_convs is None:
            n_convs = d.get("n_convs")
        elif d.get("n_convs") != n_convs:
            raise SystemExit(
                f"refusing to merge different corpora: {n_convs} vs "
                f"{d.get('n_convs')} ({p})")
    if not pairs:
        raise SystemExit("no pairs found")
    return {
        "n_convs": n_convs,
        "campaigns": per_file,
        "pair_efficiencies": sorted(pairs),
        "scaling_efficiency": round(statistics.median(pairs), 3),
        "scaling_efficiency_estimator":
            f"median of {len(pairs)} pairs across {len(paths)} campaigns",
        "best_pair_efficiency": max(pairs),
        "worst_pair_efficiency": min(pairs),
        "n_discarded_runs": discards,
    }


def main() -> None:
    args = sys.argv[1:]
    out = None
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if not args:
        raise SystemExit(__doc__)
    result = merge(args)
    print(json.dumps(result, indent=1))
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
