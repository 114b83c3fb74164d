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


@pytest.mark.slow
def test_bounded_memory_chunked_identical(spark):
    """Round-1 VERDICT wrong #3 done-condition: with tiny Arrow chunks
    and partitions >> defaultParallelism, the streamed grouped passes
    (grouped.stream_groups) must produce byte-identical Turtle — i.e.
    correctness is independent of chunking/partitioning, and no code
    path concatenates a whole partition."""
    tr = spark.sql(
        transcripts_sql("(SELECT id AS doc_id FROM range(60))",
                        dialect="spark")
    ).cache()
    baseline = {r.conv_id: r.ttl
                for r in KGPipeline(tr, cache=False).turtle().collect()}
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        spark.conf.set("spark.gg2rdf.groupPartitions", "64")
        chunked = {r.conv_id: r.ttl
                   for r in KGPipeline(tr, cache=False).turtle().collect()}
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_batch
        )
        spark.conf.unset("spark.gg2rdf.groupPartitions")
    assert baseline == chunked
    # and the streamed passes must not hold whole partitions in pandas
    import inspect

    from gg2rdf_spark.operators import assemble, serialize

    for mod in (assemble, serialize):
        src = inspect.getsource(mod)
        assert "pd.concat(list(batches))" not in src
        assert "pd.concat(chunks" not in src


def test_invalid_auth_citation_name_statuses(spark):
    """Round-2 ADVICE: the invalid-authority citation branch's
    emission-conditional makeTaxonName can raise has_warnings with NO
    punctuation change (junk-token 'ignoring genus \"var\"'), so the
    fold must carry those statuses gated on name_emitted.  Differential
    vs refimpl on a hand-built conversation outside the generator's
    value space."""
    turns = [
        (0, '[[document docId=TTX1 docAuthor="Doe, A" docDate=2000'
            ' docTitle="T" masterDocId=M1]] [[mods title="T"'
            ' authors="Doe, A" date=2000 classification=book]] hi'),
        (1, 'Nomenclature. [[taxonomicName section=nomenclature'
            ' rank=species kingdom=Animalia genus=Felis species=catus'
            ' authorityName=Doe authorityYear=2000 status="sp. nov."]]'
            'Felis catus[[/]] described.'),
        (4, 'References. [[treatmentCitation section=reference_group'
            ' rank=species kingdom=Animalia genus=var species=foo]]'),
    ]
    ref = refimpl.transform_turns("cX", turns)
    assert ref.status == refimpl.STATUS_HAS_WARNINGS  # from 'ignoring genus'

    tr = spark.createDataFrame(
        [("cX", t, "user", txt, None) for t, txt in turns],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    pipe = KGPipeline(tr, cache=False)
    st = {r.conv_id: r.status for r in pipe.status().collect()}
    assert st == {"cX": ref.status}
    ours = {(r.subj, r.pred, r.obj) for r in pipe.flat_triples().collect()}
    assert ours == set(ref.triples())


def test_nested_citation_units(spark):
    """gg2rdf.ts:330-341: a reference_group taxonomicName nested inside
    a handled treatmentCitation(Group) is NOT its own citation unit —
    flat-unit logic would double-emit.  Differential refimpl≡pipeline
    on a nested corpus, plus an explicit no-double-emit assertion."""
    doc0 = (
        '[[document docId=TTN1 docAuthor="Doe, A" docDate=2001'
        ' docTitle="T" masterDocId=M2]] [[mods title="T" authors="Doe, A"'
        ' date=2001 classification=book]] hi'
    )
    taxon = (
        'Nomenclature. [[taxonomicName section=nomenclature rank=species'
        ' kingdom=Animalia genus=Apis species=mellifera authorityName=Doe'
        ' authorityYear=2001 status="sp. nov."]]Apis mellifera[[/]] here.'
    )
    # group containing TWO nested taxa (first wins), then a nested
    # treatmentCitation (skipped as a unit, its taxon feeds the group);
    # then a flat treatmentCitation; then a bare nested-marked taxon
    refs = (
        "References."
        " [[treatmentCitationGroup section=reference_group]]"
        " [[taxonomicName section=reference_group"
        "   _inside=treatmentCitationGroup rank=species kingdom=Animalia"
        "   genus=Vespa species=crabro authorityName=Roe"
        "   authorityYear=1900]]Vespa crabro[[/]]"
        " [[treatmentCitation section=reference_group"
        "   _inside=treatmentCitationGroup]]"
        " [[taxonomicName section=reference_group"
        "   _inside=treatmentCitation rank=species kingdom=Animalia"
        "   genus=Vespa species=velutina authorityName=Poe"
        "   authorityYear=1905]]Vespa velutina[[/]]"
        " [[treatmentCitation section=reference_group rank=species"
        "   kingdom=Animalia genus=Bombus species=terrestris"
        "   authorityName=Moe authorityYear=1910]]"
    )
    turns = [(0, doc0), (1, taxon), (4, refs)]
    ref = refimpl.transform_turns("cN", turns)
    ref_triples = set(ref.triples())
    cited = {o for s, p, o in ref_triples
             if p in ("cito:cites", "trt:deprecates", "trt:citesTaxonName")}
    # exactly TWO citation units survive: the group (→ Vespa crabro,
    # its FIRST nested taxon) and the flat Bombus citation; the
    # nested velutina taxon and nested treatmentCitation are skipped
    assert any("Vespa_crabro" in o for o in cited)
    assert any("Bombus_terrestris" in o for o in cited)
    assert not any("velutina" in o for o in cited)

    tr = spark.createDataFrame(
        [("cN", t, "assistant", txt, None) for t, txt in turns],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    pipe = KGPipeline(tr, cache=False)
    ours = {(r.subj, r.pred, r.obj) for r in pipe.flat_triples().collect()}
    assert ours == ref_triples
    ttl = {r.conv_id: r.ttl for r in pipe.turtle().collect()}
    assert ttl["cN"] == ref.turtle()


def test_nested_taxon_after_flat_taxon_unit(spark):
    """Round-2 ADVICE: when the most recent citation unit is itself a
    flat taxonomicName, a following nested-marked taxon must NOT
    override its attrs — refimpl's units[-1][0].kind guard keeps the
    unit's own attrs and drops the nested mention.  Unreachable from
    tree-derived XML (a container element always precedes its
    descendants) but reachable in flat-span fixtures; differential
    refimpl≡pipeline on exactly that shape."""
    doc0 = (
        '[[document docId=TTN2 docAuthor="Doe, A" docDate=2002'
        ' docTitle="T" masterDocId=M3]] [[mods title="T" authors="Doe, A"'
        ' date=2002 classification=book]] hi'
    )
    taxon = (
        'Nomenclature. [[taxonomicName section=nomenclature rank=species'
        ' kingdom=Animalia genus=Apis species=cerana authorityName=Doe'
        ' authorityYear=2002 status="sp. nov."]]Apis cerana[[/]] here.'
    )
    refs = (
        "References."
        # flat taxonomicName citation unit...
        " [[taxonomicName section=reference_group rank=species"
        "   kingdom=Animalia genus=Vespa species=orientalis"
        "   authorityName=Roe authorityYear=1901]]Vespa orientalis[[/]]"
        # ...followed by a nested-marked taxon whose container was
        # dropped from the span stream: must be discarded, not
        # attached to the preceding taxonomicName unit
        " [[taxonomicName section=reference_group"
        "   _inside=treatmentCitation rank=species kingdom=Animalia"
        "   genus=Vespa species=mandarinia authorityName=Poe"
        "   authorityYear=1902]]Vespa mandarinia[[/]]"
    )
    turns = [(0, doc0), (1, taxon), (4, refs)]
    ref = refimpl.transform_turns("cG", turns)
    ref_triples = set(ref.triples())
    cited = {o for s, p, o in ref_triples
             if p in ("cito:cites", "trt:deprecates", "trt:citesTaxonName")}
    assert any("Vespa_orientalis" in o for o in cited)
    assert not any("mandarinia" in o for o in cited)

    tr = spark.createDataFrame(
        [("cG", t, "assistant", txt, None) for t, txt in turns],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    pipe = KGPipeline(tr, cache=False)
    ours = {(r.subj, r.pred, r.obj) for r in pipe.flat_triples().collect()}
    assert ours == ref_triples
    ttl = {r.conv_id: r.ttl for r in pipe.turtle().collect()}
    assert ttl["cG"] == ref.turtle()
