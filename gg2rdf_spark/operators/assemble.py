"""Stages 2-3 — triple construction + per-conversation assembly.

Dataflow (SURVEY.md §2.1):

* conv-level pass (``conv_frame``): one Arrow batch pass over
  (docs ⟕ treatment_taxon) computing the treatment/publication/concept
  bundles (C1, C2, C3, C6, F8-F15) — one row per conversation.
* mention-level passes: citations (D5 + C2), figures (C4), materials
  (C5), vernaculars (F13) — Arrow passes over kind-filtered mentions.
* the alreadyCited fold (D3, gg2rdf.ts:90, 1102-1143): the one
  genuinely order-sensitive reference semantic (emission guards feed
  back into the set that guards later emissions), expressed as a
  grouped ``applyInPandas`` — a linear fold over the (small) citation
  list of each conversation, parallel across conversations.  A window
  function cannot express it because additions to the guard set are
  conditional on emissions which are conditional on the set (see
  SURVEY.md §2 row D3).
* everything else is relational: registry merge ≙ dropDuplicates +
  min-ord (D1), subject-existence ≙ semi-join on push rows, citation
  set-difference ≙ anti-join (D4), deterministic order ≙ explicit
  (block, subj_ord, obj_ord) sort keys (E1-E3).

Triples frame schema: (conv_id, block, subj_ord, subj, pred, obj,
obj_ord) where block encodes the reference's emission order
(gg2rdf.ts:97-103): 0 raw pre-treatment lines · 1 raw material
warnings · 2 treatment · 3 publication · 4 taxonConcepts ·
5 taxonNames · 6 figures · 7 citedMaterials.  Raw comment lines use
subj='' and pred='#'.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import kg_bundles as B

PROP = StructType([
    StructField("pred", StringType()),
    StructField("obj", StringType()),
])
LEVEL = StructType([
    StructField("uri", StringType()),
    StructField("push", BooleanType()),
    StructField("lord", IntegerType()),
    StructField("props", ArrayType(PROP)),
])

CONV_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("missing_document", BooleanType()),
    StructField("failed_error", StringType()),
    StructField("doc_id", StringType()),
    StructField("treatment_uri", StringType()),
    StructField("statuses", ArrayType(IntegerType())),
    StructField("raw0", ArrayType(StringType())),
    StructField("t_props", ArrayType(PROP)),
    StructField("pub_props", ArrayType(PROP)),
    StructField("publication", StringType()),
    StructField("seed_uri", StringType()),
    StructField("seed_tnuri", StringType()),
    StructField("vern_target", StringType()),
    StructField("concept_ok", BooleanType()),
    StructField("concept_uri", StringType()),
    StructField("concept_props", ArrayType(PROP)),
    StructField("concept_name", ArrayType(LEVEL)),
])

CIT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("unit_ord", IntegerType()),
    StructField("branch", StringType()),
    StructField("warn_obj", StringType()),
    StructField("uri", StringType()),
    StructField("tnuri", StringType()),
    StructField("year", StringType()),
    StructField("statuses", ArrayType(IntegerType())),
    StructField("error", StringType()),
    StructField("c_ok", BooleanType()),
    StructField("c_uri", StringType()),
    StructField("c_props", ArrayType(PROP)),
    StructField("c_name", ArrayType(LEVEL)),
    StructField("name_if_emitted", ArrayType(LEVEL)),
    StructField("nie_statuses", ArrayType(IntegerType())),
])

FIG_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("ord", IntegerType()),
    StructField("uri", StringType()),
    StructField("props", ArrayType(PROP)),
])

MAT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("ord", IntegerType()),
    StructField("uri", StringType()),
    StructField("props", ArrayType(PROP)),
    StructField("warn", BooleanType()),
])

VERN_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("ord", IntegerType()),
    StructField("props", ArrayType(PROP)),
])

FOLD_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("unit_ord", IntegerType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("name_emitted", BooleanType()),
])

TRIPLES_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("block", IntegerType()),
    StructField("subj_ord", LongType()),
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("obj_ord", LongType()),
])


def _props(plist) -> list[dict]:
    return [{"pred": p, "obj": o} for p, o in plist]


def _levels(name: Optional[dict]) -> list[dict]:
    if not name:
        return []
    return [
        {"uri": l["uri"], "push": l["push"], "lord": l.get("ord", 0),
         "props": _props(l["props"])}
        for l in name["levels"]
    ]


# ---------------------------------------------------------------------------
# conv-level pass
# ---------------------------------------------------------------------------


def conv_frame(docs: DataFrame, tt: DataFrame,
               repartition: bool = True) -> DataFrame:
    joined = docs.join(
        tt.select("conv_id", "tt_attrs", "tt_status"), "conv_id", "left"
    )
    # the bundle computation is CPU-bound Python per conversation: size
    # the shuffle from data volume (floored at cluster parallelism so
    # AQE byte-based coalescing can't serialize it — measured round 1:
    # efficiency 0.60 without the floor).  ``repartition=False`` skips
    # the exchange when the caller guarantees the inputs already carry
    # a suitable hash(conv_id) layout (KGPipeline persists docs/tt
    # co-partitioned, round 6) — the rows are per-conversation
    # independent, so partitioning affects only parallelism here.
    from .grouped import scaled_partitions

    if repartition:
        joined = joined.repartition(
            scaled_partitions(joined), "conv_id"
        )

    # NOTE: doc_attrs / tt_attrs are NOT re-emitted through this pass —
    # citation_frame joins them from the docs/tt frames directly, so the
    # Arrow output here stays narrow (round-1 VERDICT: the conv-bundle
    # pass was the scaling bottleneck at 0.5× via bytes-per-row)
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, doc_attrs, mods_attrs, tt_attrs, tt_status in zip(
                pdf["conv_id"], pdf["doc_attrs"], pdf["mods_attrs"],
                pdf["tt_attrs"], pdf["tt_status"],
            ):
                t = B.treatment_bundle(doc_attrs, mods_attrs, tt_attrs, tt_status)
                c = t["concept"]
                rows.append({
                    "conv_id": conv_id,
                    "missing_document": t["missing_document"],
                    "failed_error": t["failed_error"],
                    "doc_id": t["doc_id"],
                    "treatment_uri": t["treatment_uri"],
                    "statuses": t["statuses"],
                    "raw0": t["raw0"],
                    "t_props": _props(t["t_props"]),
                    "pub_props": _props(t["pub_props"]),
                    "publication": t["publication"],
                    "seed_uri": t["seed_uri"],
                    "seed_tnuri": t["seed_tnuri"],
                    "vern_target": t["vern_target"],
                    "concept_ok": bool(c["ok"]) if c else False,
                    "concept_uri": c["uri"] if c else None,
                    "concept_props": _props(c["props"]) if c else [],
                    "concept_name": _levels(c["name"]) if c else [],
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in CONV_SCHEMA.fields]
            )

    return joined.mapInPandas(gen, CONV_SCHEMA)


# ---------------------------------------------------------------------------
# mention-level passes
# ---------------------------------------------------------------------------


def citation_frame(mentions: DataFrame, docs: DataFrame,
                   tt: DataFrame, repartition: bool = True) -> DataFrame:
    """One row per reference_group citation unit (gg2rdf.ts:327-341),
    ordered by document position within the conversation.

    The doc/treatment attr bags join in from the extraction frames
    directly (NOT through the conv-bundle pass, which would force that
    pass to round-trip two map columns through Arrow just to feed this
    one)."""
    from ..functions.kernels import TAXON_KEYS as _TAXON_KEYS
    from .grouped import scaled_partitions

    # NULL-safe: most mentions carry no `_inside`, and `NULL == x`
    # is NULL (not false) — which would silently drop every flat unit
    inside = F.coalesce(F.col("attrs")["_inside"], F.lit(""))
    is_nested_taxon = (F.col("kind") == "taxonomicName") & inside.isin(
        "treatmentCitation", "treatmentCitationGroup"
    )
    rows = (
        mentions.filter(
            (F.col("section") == "reference_group")
            & F.col("kind").isin(
                "treatmentCitationGroup", "treatmentCitation", "taxonomicName"
            )
        )
        # nested-unit skipping (gg2rdf.ts:330-336 closest() tests):
        # a treatmentCitation inside a group is not its own unit
        .filter(
            ~((F.col("kind") == "treatmentCitation")
              & (inside == "treatmentCitationGroup"))
        )
        # g_ord (global mention order) is monotone in document order —
        # exactly the property the fold and ord keys need
        .select("conv_id", "g_ord", "kind", "attrs",
                (~is_nested_taxon).alias("is_unit"))
    )
    # a nested taxonomicName is the cited taxon of its most recent
    # surviving container (document order == closest surviving
    # ancestor); querySelector takes the FIRST one (gg2rdf.ts:339-341).
    # Everything below the semi-join involves ONLY conversations that
    # contain at least one nested mention: on a fully flat corpus (the
    # common case, and every pre-round-2 corpus) nested_convs is
    # empty, the window/groupBy run over zero rows, and AQE broadcasts
    # the empty build side — the unit stream itself never shuffles.
    nested_convs = (
        rows.filter(~F.col("is_unit")).select("conv_id").distinct()
    )
    scoped = rows.join(F.broadcast(nested_convs), "conv_id", "semi")
    w = (
        Window.partitionBy("conv_id").orderBy("g_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scoped = scoped.withColumn(
        "container_ord",
        F.last(F.when(F.col("is_unit"), F.col("g_ord")), ignorenulls=True)
        .over(w),
    )
    nested_first = (
        scoped.filter(~F.col("is_unit") & F.col("container_ord").isNotNull())
        .groupBy("conv_id", "container_ord")
        .agg(F.min_by("attrs", "g_ord").alias("nested_attrs"))
        # rename to break self-join lineage ambiguity
        .select(F.col("conv_id").alias("n_conv_id"),
                F.col("container_ord").alias("n_ord"), "nested_attrs")
    )
    has_taxon_keys = F.arrays_overlap(
        F.map_keys(F.col("attrs")),
        F.array(*[F.lit(k) for k in sorted(_TAXON_KEYS)]),
    )
    cits = (
        rows.filter("is_unit")
        .join(
            nested_first,
            (F.col("conv_id") == F.col("n_conv_id"))
            & (F.col("g_ord") == F.col("n_ord")),
            "left",
        )
        .drop("n_conv_id", "n_ord")
        .withColumn(
            "resolved_attrs",
            F.coalesce(
                # a taxonomicName unit is its own cited taxon — a
                # nested taxon never overrides it (refimpl
                # resolve_citation_units: units[-1][0].kind guard;
                # the nested mention is dropped, not reassigned)
                F.when(F.col("kind") != "taxonomicName",
                       F.col("nested_attrs")),
                F.when(
                    (F.col("kind") == "taxonomicName") | has_taxon_keys,
                    F.col("attrs"),
                ),
            ),
        )
        # container without any taxon: logged + skipped (:354-356)
        .filter(F.col("resolved_attrs").isNotNull())
        .select("conv_id", F.col("g_ord").alias("unit_ord"),
                F.col("resolved_attrs").alias("attrs"))
    )
    joined = cits.join(
        docs.select("conv_id", "doc_attrs"), "conv_id", "left"
    ).join(tt.select("conv_id", "tt_attrs"), "conv_id", "left")
    # per-unit independent Python — the exchange is width control only;
    # skipped when the caller pre-partitioned the inputs (KGPipeline)
    if repartition:
        joined = joined.repartition(scaled_partitions(joined), "conv_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, unit_ord, attrs, doc_attrs, tt_attrs in zip(
                pdf["conv_id"], pdf["unit_ord"], pdf["attrs"],
                pdf["doc_attrs"], pdf["tt_attrs"],
            ):
                cb = B.citation_bundle(attrs, doc_attrs or {}, tt_attrs)
                c = cb["concept"]
                rows.append({
                    "conv_id": conv_id,
                    "unit_ord": int(unit_ord),
                    "branch": cb["branch"],
                    "warn_obj": cb["warn_obj"],
                    "uri": cb["uri"],
                    "tnuri": cb["tnuri"],
                    "year": cb["year"],
                    "statuses": cb["statuses"]
                    + ([B.HAS_ERRORS] if cb["error"] else []),
                    "error": cb["error"],
                    "c_ok": bool(c["ok"]) if c else False,
                    "c_uri": c["uri"] if c else None,
                    "c_props": _props(c["props"]) if c else [],
                    "c_name": _levels(c["name"]) if c else [],
                    "name_if_emitted": _levels(cb["name_if_emitted"]),
                    "nie_statuses": cb["nie_statuses"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in CIT_SCHEMA.fields])

    return joined.mapInPandas(gen, CIT_SCHEMA)


def figure_frame(mentions: DataFrame) -> DataFrame:
    figs = (
        mentions.filter(
            (F.col("kind") == "figureCitation")
            & (
                F.map_contains_key(F.col("attrs"), "httpUri")
                | F.map_contains_key(F.col("attrs"), "figureDoi")
            )
        )
        .select("conv_id", F.col("g_ord").alias("ord"), "attrs")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, ord_, attrs in zip(
                pdf["conv_id"], pdf["ord"], pdf["attrs"]
            ):
                fb = B.figure_bundle(attrs)
                rows.append({
                    "conv_id": conv_id, "ord": int(ord_),
                    "uri": fb["uri"], "props": _props(fb["props"]),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FIG_SCHEMA.fields])

    return figs.mapInPandas(gen, FIG_SCHEMA)


def material_frame(mentions: DataFrame, convs: DataFrame) -> DataFrame:
    mats = (
        mentions.filter(F.col("kind") == "materialsCitation")
        .select("conv_id", F.col("g_ord").alias("ord"), "attrs")
        .join(convs.select("conv_id", "doc_id"), "conv_id", "left")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, ord_, attrs, doc_id in zip(
                pdf["conv_id"], pdf["ord"], pdf["attrs"], pdf["doc_id"]
            ):
                mb = B.material_bundle(attrs, doc_id or "MISSING_ID")
                rows.append({
                    "conv_id": conv_id, "ord": int(ord_), "uri": mb["uri"],
                    "props": _props(mb["props"]), "warn": mb["warn"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MAT_SCHEMA.fields])

    return mats.mapInPandas(gen, MAT_SCHEMA)


def vernacular_frame(mentions: DataFrame) -> DataFrame:
    verns = (
        mentions.filter(F.col("kind") == "vernacularName")
        .select("conv_id", F.col("g_ord").alias("ord"), "attrs", "surface")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, ord_, attrs, surface in zip(
                pdf["conv_id"], pdf["ord"], pdf["attrs"], pdf["surface"]
            ):
                props = B.vernacular_prop(surface, (attrs or {}).get("language"))
                rows.append({
                    "conv_id": conv_id, "ord": int(ord_),
                    "props": _props(props),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in VERN_SCHEMA.fields])

    return verns.mapInPandas(gen, VERN_SCHEMA)


# ---------------------------------------------------------------------------
# the alreadyCited fold  (D3, gg2rdf.ts:1102-1143)
# ---------------------------------------------------------------------------


def citation_fold(cits: DataFrame, convs: DataFrame,
                  pre_partitioned: bool = False) -> DataFrame:
    """Grouped ordered fold: per conversation, walk citation units in
    document order maintaining the alreadyCited set (seeded with the
    treatment's own concept/name URIs, gg2rdf.ts:278-280), emitting
    treatment-subject citation props."""
    joined = cits.join(
        convs.select("conv_id", "seed_uri", "seed_tnuri"), "conv_id", "left"
    ).select(
        "conv_id", "unit_ord", "branch", "warn_obj", "uri", "tnuri", "year",
        "error", "c_ok", "c_uri", "seed_uri", "seed_tnuri",
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("unit_ord")
        cited: set[str] = set()
        seed_uri = pdf.iloc[0]["seed_uri"] if len(pdf) else None
        seed_tnuri = pdf.iloc[0]["seed_tnuri"] if len(pdf) else None
        if isinstance(seed_uri, str) and seed_uri:
            cited.add(seed_uri)
        if isinstance(seed_tnuri, str) and seed_tnuri:
            cited.add(seed_tnuri)
        treatment_uri = seed_uri if isinstance(seed_uri, str) else None
        out = []

        def emit(u, pred, obj, name_emitted=False):
            out.append({
                "conv_id": u["conv_id"], "unit_ord": int(u["unit_ord"]),
                "pred": pred, "obj": obj, "name_emitted": name_emitted,
            })

        for _, u in pdf.iterrows():
            branch = u["branch"]
            if u["error"]:
                msg = f"Could not add TaxonConceptCitation\nError: {u['error']}"
                emit(u, "# Error:", msg.replace("\n", "\n# "))
            elif branch == "rank_issue":
                emit(u, "# Warning:", u["warn_obj"])
            elif branch == "invalid_auth":
                if u["uri"] not in cited:
                    emit(u, "trt:citesTaxonName", u["uri"], name_emitted=True)
                    cited.add(u["uri"])
            elif branch == "cites":
                if u["c_ok"]:
                    if u["uri"] not in cited and (
                        u["tnuri"] not in cited or bool(u["year"])
                    ):
                        emit(u, "cito:cites", u["uri"])
                        cited.add(u["uri"])
                elif u["tnuri"] not in cited:
                    emit(u, "trt:citesTaxonName", u["tnuri"])
                cited.add(u["tnuri"])
            elif branch == "same_none":
                pass
            elif branch == "deprecates":
                if u["c_ok"]:
                    if treatment_uri is not None and u["uri"] == treatment_uri:
                        continue  # do not let a taxon deprecate itself
                    emit(u, "trt:deprecates", u["uri"])
                    cited.add(u["uri"])
                elif u["tnuri"] not in cited:
                    emit(u, "trt:citesTaxonName", u["tnuri"])
                cited.add(u["tnuri"])
        return pd.DataFrame(
            out, columns=[f.name for f in FOLD_SCHEMA.fields]
        )

    # streamed grouped pass: complete conversations flush per Arrow
    # chunk (only the boundary group carries over) — peak memory is one
    # chunk + one group, not one whole partition (grouped.py).
    # pre_partitioned propagates the caller's guarantee that cits and
    # convs are persisted hash(conv_id)-co-partitioned (KGPipeline), in
    # which case the join preserves conv co-location and the fold's
    # repartition exchange is skipped.
    from .grouped import stream_groups

    return stream_groups(joined, "conv_id", fold, FOLD_SCHEMA,
                         pre_partitioned=pre_partitioned)
