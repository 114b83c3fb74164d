"""Differential test: distributed pipeline ≡ serial oracle.

The P/R≥0.95 gate from BASELINE.json, run at strict equality: the
Spark pipeline's triple set, Turtle serialization, and per-conversation
status must *exactly* match the reference-semantics oracle
(gg2rdf_spark.refimpl) on two corpora:

* the SQL-derived bulk corpus (same definition the driver's DuckDB
  oracle uses), via ``range()`` so no parquet dependency;
* the Python recipe corpus (different scenario mix: all material
  styles, authority styles 0-7, SAME/DEPRECATES/dup citations).

Oracle shape follows the reference's own differential strategy
(/root/reference/test_noxslt.fish:34-48): order-insensitive triple-set
comparison per document.
"""

from collections import defaultdict

import pytest

from gg2rdf_spark import refimpl
from gg2rdf_spark.pipeline import KGPipeline, precision_recall
from gg2rdf_spark.sources import recipe
from gg2rdf_spark.sources.synthsql import transcripts_sql

N_SQL = 150
N_RECIPE = 200


def _ref_side(turns_by_conv):
    triples, status, ttl = [], {}, {}
    for cid, ts in turns_by_conv.items():
        res = refimpl.transform_turns(cid, ts)
        status[cid] = res.status
        ttl[cid] = res.turtle()
        for s, p, o in res.triples():
            triples.append((cid, s, p, o))
    return triples, status, ttl


def _check(spark, tr_df):
    turns = defaultdict(list)
    for r in tr_df.select("conv_id", "turn_idx", "text").collect():
        turns[r.conv_id].append((r.turn_idx, r.text))
    ref_triples, ref_status, ref_ttl = _ref_side(turns)

    pipe = KGPipeline(tr_df)
    ours = [
        (r.conv_id, r.subj, r.pred, r.obj)
        for r in pipe.flat_triples().collect()
    ]
    pr = precision_recall(ours, ref_triples)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr

    st = {r.conv_id: r.status for r in pipe.status().collect()}
    assert st == ref_status

    ttl = {r.conv_id: r.ttl for r in pipe.turtle().collect()}
    assert set(ttl) == set(ref_ttl)
    mismatched = [c for c in ttl if ttl[c] != ref_ttl[c]]
    assert not mismatched, (
        mismatched[:3],
        ttl[mismatched[0]][:600] if mismatched else "",
        ref_ttl[mismatched[0]][:600] if mismatched else "",
    )


@pytest.mark.slow
def test_sql_corpus_parity(spark):
    tr = spark.sql(
        transcripts_sql(f"(SELECT id AS doc_id FROM range({N_SQL}))",
                        dialect="spark")
    ).cache()
    assert tr.count() == N_SQL * 5
    _check(spark, tr)


@pytest.mark.slow
def test_recipe_corpus_parity(spark):
    rows = []
    for doc_id in range(N_RECIPE):
        rows.extend(recipe.conversation_turns(doc_id))
    tr = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
         for r in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).cache()
    _check(spark, tr)
