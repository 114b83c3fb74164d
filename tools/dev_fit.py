"""Dev harness for fitting the recipe-SQL oracles (kg_triples_by_pred,
kg_status_counts) against refimpl ground truth — no Spark involved.

Usage: python tools/dev_fit.py [sf_dir]
Writes /tmp/truth_pred.parquet + /tmp/truth_status.parquet and prints
the per-pred corpus totals.
"""

import collections
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from gg2rdf_spark.sources.synthsql import transcripts_sql  # noqa: E402
from gg2rdf_spark import refimpl  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(
        transcripts_sql("documents", "duckdb")
        + " ORDER BY conv_id, turn_idx"
    ).fetchall()
    byconv: dict[str, list] = {}
    for conv_id, turn_idx, role, text, tool, ts in rows:
        byconv.setdefault(conv_id, []).append((turn_idx, text))

    pred_rows, status_rows = [], []
    for cid, turns in byconv.items():
        res = refimpl.transform_turns(cid, turns)
        status_rows.append((cid, res.status))
        c = collections.Counter(p for (s, p, o) in set(res.triples()))
        for p, n in c.items():
            pred_rows.append((cid, p, n))

    pd.DataFrame(pred_rows, columns=["conv_id", "pred", "n"]).to_parquet(
        "/tmp/truth_pred.parquet"
    )
    pd.DataFrame(status_rows, columns=["conv_id", "status"]).to_parquet(
        "/tmp/truth_status.parquet"
    )
    tot = collections.Counter()
    for _, p, n in pred_rows:
        tot[p] += n
    for p in sorted(tot):
        print(f"{tot[p]:8d}  {p}")
    st = collections.Counter(s for _, s in status_rows)
    print("status:", dict(sorted(st.items())))
    print(f"{len(byconv)} convs, {len(tot)} preds")


if __name__ == "__main__":
    main()
