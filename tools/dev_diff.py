"""Diff the recipe-SQL oracles (kgoracle) against refimpl ground truth
(/tmp/truth_*.parquet from tools/dev_fit.py).

Usage: python tools/dev_diff.py [sf_dir] [pred-to-drill ...]
"""

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from gg2rdf_spark.sources.kgoracle import (  # noqa: E402
    kg_status_counts_sql, kg_triples_by_pred_sql,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    drill = sys.argv[2:]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW truth_pred AS SELECT * FROM "
        "read_parquet('/tmp/truth_pred.parquet')"
    )
    con.execute(
        "CREATE VIEW truth_status AS SELECT * FROM "
        "read_parquet('/tmp/truth_status.parquet')"
    )

    # ---- status ---------------------------------------------------------
    con.execute(
        "CREATE TEMP TABLE cand_status AS "
        + kg_status_counts_sql(per_conv=True)
    )
    bad = con.execute("""
        SELECT t.conv_id, t.status AS truth, c.status AS cand
        FROM truth_status t LEFT JOIN cand_status c USING (conv_id)
        WHERE t.status IS DISTINCT FROM c.status LIMIT 10
    """).fetchall()
    print(f"status: {'OK' if not bad else f'{len(bad)}+ mismatched convs'}")
    for row in bad:
        print("  ", row)

    # ---- preds ----------------------------------------------------------
    con.execute(
        "CREATE TEMP TABLE cand_pred AS "
        + kg_triples_by_pred_sql(per_conv=True)
    )
    diffs = con.execute("""
        SELECT coalesce(t.pred, c.pred) AS pred,
               sum(coalesce(t.n, 0)) AS truth_n,
               sum(coalesce(c.n, 0)) AS cand_n,
               count(*) FILTER (WHERE coalesce(t.n,0) <> coalesce(c.n,0))
                 AS bad_convs
        FROM truth_pred t FULL JOIN cand_pred c
          ON t.conv_id = c.conv_id AND t.pred = c.pred
        GROUP BY 1 HAVING sum(coalesce(t.n,0)) <> sum(coalesce(c.n,0))
            OR count(*) FILTER (WHERE coalesce(t.n,0) <> coalesce(c.n,0)) > 0
        ORDER BY 1
    """).fetchall()
    if not diffs:
        print("preds: OK (all per-conv counts match)")
    for pred, tn, cn, bad_convs in diffs:
        print(f"PRED {pred}: truth={tn} cand={cn} bad_convs={bad_convs}")
    for pred in drill:
        rows = con.execute("""
            SELECT coalesce(t.conv_id, c.conv_id), t.n, c.n
            FROM (SELECT * FROM truth_pred WHERE pred = ?) t
            FULL JOIN (SELECT * FROM cand_pred WHERE pred = ?) c
              ON t.conv_id = c.conv_id
            WHERE coalesce(t.n,0) <> coalesce(c.n,0)
            ORDER BY 1 LIMIT 12
        """, [pred, pred]).fetchall()
        print(f"--- drill {pred}:")
        for r in rows:
            print("  conv", r)


if __name__ == "__main__":
    main()
