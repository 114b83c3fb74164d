"""Count DISTINCT executable operators in a formatted Spark plan.

`explain("formatted")` re-prints a cached/staged subtree at EVERY
reference, so naive text counts overstate what executes.  Two facts
make an honest count possible from the text alone (no Spark needed,
so the claims in OPTIMIZATION_r06.md can be re-checked directly
against the committed plans/r06/*.txt):

* every operator carries a UNIQUE numeric id `(n)` — textual repeats
  of a subtree reuse the same ids, so distinct (op, id) pairs = the
  distinct operator instances;
* executed AQE plans print an `== Initial Plan ==` section under each
  AdaptiveSparkPlan — the pre-runtime plan that did NOT execute —
  which must be skipped (its ids duplicate nothing in the final plan
  for nodes AQE removed, e.g. elided exchanges).

Usage: python tools/plan_outer_ops.py plans/r06/<file>.txt ...
"""

import re
import sys

OP = re.compile(r"(?:^|[+:\- ])([A-Za-z][A-Za-z]*(?:[A-Z][a-z]+)*)[\w ]*\((\d+)\)")
# op name directly before its "(id)"; tolerate suffixes like
# ", Statistics(...)" after the id (query-stage nodes)
NODE = re.compile(r"([A-Za-z][\w]*)[^(]*?\((\d+)\)(?:,.*)?\s*$")
INITIAL = "== Initial Plan =="
FINAL = "== Final Plan =="


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def distinct_ops(path: str) -> dict:
    ops: dict[str, set] = {}
    skip_indent = None  # inside an Initial Plan section
    with open(path) as f:
        for line in f:
            if not line.strip():
                break  # end of tree section (details follow)
            if INITIAL in line:
                skip_indent = line.index("=")
                continue
            if skip_indent is not None:
                if FINAL in line and line.index("=") <= skip_indent:
                    skip_indent = None
                    continue
                cur = len(line) - len(line.lstrip(" :"))
                if line.strip().startswith(("==",)):
                    pass
                if cur > skip_indent - 4 and not (
                    FINAL in line and line.index("=") < skip_indent
                ):
                    # still inside the skipped initial-plan subtree
                    # unless this line out-dents past the marker
                    if cur >= skip_indent - 3:
                        continue
                    skip_indent = None
                else:
                    skip_indent = None
            m = NODE.search(line.rstrip())
            if m:
                op, oid = m.group(1), int(m.group(2))
                ops.setdefault(op, set()).add(oid)
    return {k: len(v) for k, v in ops.items()}


def main() -> None:
    keys = ["Exchange", "Sort", "SortMergeJoin", "BroadcastHashJoin",
            "MapInPandas", "Window", "ShuffleQueryStage",
            "TableCacheQueryStage", "InMemoryRelation"]
    for path in sys.argv[1:]:
        c = distinct_ops(path)
        print(f"{path}:")
        print("  " + " ".join(f"{k}:{c.get(k, 0)}" for k in keys))


if __name__ == "__main__":
    main()
