"""Stage 4 — deterministic Turtle serialization (A4, E1-E3).

Reproduces gg2rdf's serializer byte-for-byte (gg2rdf.ts:62-72,
1502-1531): fixed prefix header, subjects in registry emission order
(block, subj_ord), predicate order = comments-first / 'a'-last /
lexicographic (:10-22), objects sorted lexicographically except for
comment-only subjects where insertion order is kept (:1510-1523).

Implemented as a grouped Arrow pass per conversation — each group is
one output document, parallel across conversations; ordering inside a
group is explicit, so the result is invariant to partitioning.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

PREFIX_HEADER = """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix bibo: <http://purl.org/ontology/bibo/> .
@prefix cito: <http://purl.org/spar/cito/> .
@prefix dc: <http://purl.org/dc/elements/1.1/> .
@prefix dwc: <http://rs.tdwg.org/dwc/terms/> .
@prefix dwcFP: <http://filteredpush.org/ontologies/oa/dwcFP#> .
@prefix fabio: <http://purl.org/spar/fabio/> .
@prefix trt: <http://plazi.org/vocab/treatment#> ."""

TTL_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("ttl", StringType()),
])


def _pred_cmp(a: str, b: str) -> int:
    """gg2rdf.ts:10-22."""
    if a == b:
        return 0
    if a.startswith("#") and b.startswith("#"):
        return -1 if a[1:] < b[1:] else 1
    if a.startswith("#"):
        return -1
    if b.startswith("#"):
        return 1
    if a == "a":
        return 1
    if b == "a":
        return -1
    return -1 if a < b else 1


def serialize_subject(subj: str, props: dict[str, list[tuple[int, str]]]) -> str:
    """gg2rdf.ts:1506-1531; props: pred → [(obj_ord, obj)]."""
    names = sorted(props, key=functools.cmp_to_key(_pred_cmp))
    if not names:
        return f"\n# No properties for {subj}"
    if names[-1].startswith("#"):
        body = " ;\n    ".join(
            f"{n} {', '.join(o for _, o in sorted(props[n]))}" for n in names
        )
        return f"\n# No properties for {subj}\n    {body}"
    body = " ;\n    ".join(
        f"{n} {', '.join(sorted(o for _, o in props[n]))}" for n in names
    )
    return f"\n{subj}\n    {body} ."


def turtle_frame(triples: DataFrame) -> DataFrame:
    """triples frame → (conv_id, ttl).

    Partition-level Arrow pass (repartition by conv_id + in-batch
    pandas groupby) rather than per-group applyInPandas — same
    rationale as the citation fold: per-group pandas overhead dwarfs
    the per-conversation work at millions of conversations."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["block", "subj_ord", "obj_ord"])
        parts = [PREFIX_HEADER]
        # group consecutive rows by (block, subj_ord, subj)
        cur_key = None
        cur_props: dict[str, list[tuple[int, str]]] = {}
        cur_subj = ""

        def flush():
            if cur_key is None:
                return
            if cur_subj == "":
                # raw comment lines: one per row, insertion order
                for _, objs in cur_props.items():
                    for _, line in sorted(objs):
                        parts.append(line)
            else:
                parts.append(serialize_subject(cur_subj, cur_props))

        for row in pdf.itertuples(index=False):
            key = (row.block, row.subj_ord, row.subj)
            if key != cur_key:
                flush()
                cur_key, cur_subj, cur_props = key, row.subj, {}
            cur_props.setdefault(row.pred, []).append((row.obj_ord, row.obj))
        flush()
        conv_id = pdf.iloc[0]["conv_id"] if len(pdf) else None
        return pd.DataFrame({"conv_id": [conv_id], "ttl": ["\n".join(parts) + "\n"]})

    # streamed grouped pass (grouped.py): complete conversations flush
    # per Arrow chunk; memory bounded by one chunk + one conversation
    from .grouped import stream_groups

    return stream_groups(triples, "conv_id", build, TTL_SCHEMA)
