"""Relational triple assembly (D1, D2, D4, E3 + registry semantics).

Composes the bundle frames from ``assemble.py`` into the final triples
frame.  All cross-mention reference semantics are expressed as
joins/windows/aggregates here:

* registry merge & first-seen order (gg2rdf.ts:85-88, :425, :495,
  :796, :852) → min-ord windows + dropDuplicates
* orphan-subject discard (``find`` only sees *pushed* subjects,
  :852-854) → attach rule ``min_push_ord <= own_ord`` via join
* dwc:scientificNameAuthorship once-only (:555-558) → first-call window
* cito:cites ∖ trt:deprecates (:377-388) → anti-join
* figure/material object joins (:360-372) → ordered collect_list +
  array_distinct (array_distinct preserves first occurrence, matching
  JS Set insertion order)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MISSING_DOC_LINE = "# Error: Could not create RDF due to missing <document>"
MAT_WARN_LINE = (
    "# Warning: Failed to output a material citation, "
    "could not create identifier"
)

BLOCK_RAW0 = 0
BLOCK_RAWMAT = 1
BLOCK_TREATMENT = 2
BLOCK_PUBLICATION = 3
BLOCK_CONCEPTS = 4
BLOCK_NAMES = 5
BLOCK_FIGURES = 6
BLOCK_MATERIALS = 7
BLOCK_FAILTAIL = 9


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    """Positional union of same-ordered frames as a BALANCED tree.

    Every branch here is built by ``_row``/aligned selects, so the
    column order is identical by construction and positional ``union``
    skips unionByName's per-call name resolution.  Classic PySpark
    analyzes eagerly on every DataFrame op, so a left-deep chain of
    n unions costs O(n²) subtree analysis — measured ~1.0 s of the
    triples-frame DSL build at 15 branches (round 6); the balanced
    tree keeps each analyzed subtree small."""
    while len(dfs) > 1:
        dfs = [
            dfs[i].union(dfs[i + 1]) if i + 1 < len(dfs) else dfs[i]
            for i in range(0, len(dfs), 2)
        ]
    return dfs[0]


def _row(conv, block, subj_ord, subj, pred, obj, obj_ord):
    return [
        conv.alias("conv_id"), F.lit(block).cast("int").alias("block"),
        subj_ord.cast("long").alias("subj_ord"), subj.alias("subj"),
        pred.alias("pred"), obj.alias("obj"),
        obj_ord.cast("long").alias("obj_ord"),
    ]


def _explode_props(df: DataFrame, block: int, subj_col: str, props_col: str,
                   subj_ord, obj_ord_base) -> DataFrame:
    e = df.select(
        "conv_id", F.col(subj_col).alias("subj"), subj_ord.alias("so"),
        obj_ord_base.alias("ob"), F.posexplode(props_col).alias("pos", "p"),
    )
    return e.select(
        *_row(
            F.col("conv_id"), block, F.col("so"), F.col("subj"),
            F.col("p.pred"), F.col("p.obj"), F.col("ob") + F.col("pos"),
        )
    )


def _join_string(df: DataFrame, distinct: bool) -> DataFrame:
    """Ordered ', '-join of per-conv uris → (conv_id, joined).
    ``distinct`` reproduces the JS Set first-seen dedup for figures
    (gg2rdf.ts:365-372); materials keep duplicates (:360-363)."""
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("ord", "uri"))), lambda x: x["uri"]
    )
    if distinct:
        arr = F.array_distinct(arr)
    return df.groupBy("conv_id").agg(
        F.array_join(arr, ", ").alias("joined")
    )


def triples_frame(
    convs: DataFrame, cits: DataFrame, fold: DataFrame,
    figs: DataFrame, mats: DataFrame, verns: DataFrame,
) -> DataFrame:
    """Returns the (conv_id, block, subj_ord, subj, pred, obj, obj_ord)
    triples frame (raw comment lines as subj='', pred='#')."""
    ok = convs.filter(
        (~F.col("missing_document")) & F.col("failed_error").isNull()
    )
    parts: list[DataFrame] = []

    # ---- raw lines -----------------------------------------------------
    parts.append(
        convs.filter("missing_document").select(
            *_row(F.col("conv_id"), BLOCK_RAW0, F.lit(0), F.lit(""),
                  F.lit("#"), F.lit(MISSING_DOC_LINE), F.lit(0))
        )
    )
    raw0 = convs.filter(~F.col("missing_document")).select(
        "conv_id", F.posexplode("raw0").alias("pos", "line")
    )
    parts.append(
        raw0.select(
            *_row(F.col("conv_id"), BLOCK_RAW0, F.col("pos"), F.lit(""),
                  F.lit("#"), F.col("line"), F.lit(0))
        )
    )
    parts.append(
        convs.filter(F.col("failed_error").isNotNull()).select(
            *_row(
                F.col("conv_id"), BLOCK_FAILTAIL, F.lit(0), F.lit(""),
                F.lit("#"),
                F.concat(
                    F.lit("# There was some Error in gg2rdf\n# Error: "),
                    F.col("failed_error"),
                ),
                F.lit(0),
            )
        )
    )
    mat_warns = mats.filter("warn").join(
        ok.select("conv_id"), "conv_id", "left_semi"
    )
    parts.append(
        mat_warns.select(
            *_row(F.col("conv_id"), BLOCK_RAWMAT, F.col("ord"), F.lit(""),
                  F.lit("#"), F.lit(MAT_WARN_LINE), F.lit(0))
        )
    )

    # ---- treatment subject (block 2) ----------------------------------
    t_base = _explode_props(
        ok, BLOCK_TREATMENT, "treatment_uri", "t_props",
        F.lit(0), F.lit(0),
    )
    t_fold = (
        fold.join(
            ok.select("conv_id", "treatment_uri"), "conv_id", "inner"
        ).select(
            *_row(F.col("conv_id"), BLOCK_TREATMENT, F.lit(0),
                  F.col("treatment_uri"), F.col("pred"), F.col("obj"),
                  F.lit(1000) + F.col("unit_ord"))
        )
    )
    mats_ok = mats.filter(F.col("uri") != "").join(
        ok.select("conv_id"), "conv_id", "left_semi"
    )
    t_mats = (
        _join_string(mats_ok.select("conv_id", "ord", "uri"), distinct=False)
        .filter(F.col("joined") != "")
        .join(ok.select("conv_id", "treatment_uri"), "conv_id")
        .select(
            *_row(F.col("conv_id"), BLOCK_TREATMENT, F.lit(0),
                  F.col("treatment_uri"), F.lit("dwc:basisOfRecord"),
                  F.col("joined"), F.lit(2000))
        )
    )
    figs_ok = figs.join(ok.select("conv_id"), "conv_id", "left_semi")
    fig_join = _join_string(
        figs_ok.select("conv_id", "ord", "uri"), distinct=True
    ).filter(F.col("joined") != "")
    t_figs = fig_join.join(
        ok.select("conv_id", "treatment_uri"), "conv_id"
    ).select(
        *_row(F.col("conv_id"), BLOCK_TREATMENT, F.lit(0),
              F.col("treatment_uri"), F.lit("cito:cites"), F.col("joined"),
              F.lit(3000))
    )
    t_type = ok.select(
        *_row(F.col("conv_id"), BLOCK_TREATMENT, F.lit(0),
              F.col("treatment_uri"), F.lit("a"), F.lit("trt:Treatment"),
              F.lit(4000))
    )
    treatment = _union_all([t_base, t_fold, t_mats, t_figs, t_type])
    # D4: cito:cites ∖ trt:deprecates — one window over (conv, obj)
    # instead of a self-anti-join (which re-derived the treatment-frame
    # lineage three times)
    w_dep = Window.partitionBy("conv_id", "obj")
    treatment = (
        treatment.withColumn(
            "has_dep",
            F.max(F.when(F.col("pred") == "trt:deprecates", 1).otherwise(0))
            .over(w_dep),
        )
        .filter(~((F.col("pred") == "cito:cites") & (F.col("has_dep") == 1)))
        .drop("has_dep")
    )
    parts.append(treatment)

    # ---- publication subject (block 3) --------------------------------
    parts.append(
        _explode_props(ok, BLOCK_PUBLICATION, "publication", "pub_props",
                       F.lit(0), F.lit(0))
    )
    parts.append(
        fig_join.join(ok.select("conv_id", "publication"), "conv_id").select(
            *_row(F.col("conv_id"), BLOCK_PUBLICATION, F.lit(0),
                  F.col("publication"), F.lit("fabio:hasPart"),
                  F.col("joined"), F.lit(1000))
        )
    )

    # ---- taxon concepts (block 4) -------------------------------------
    c_conv = ok.filter(F.col("concept_uri").isNotNull()).select(
        "conv_id", F.col("concept_uri").alias("uri"),
        F.lit(0).alias("unit_ord"), F.col("concept_props").alias("props"),
    )
    c_cit = cits.filter(F.col("c_uri").isNotNull()).join(
        ok.select("conv_id"), "conv_id", "left_semi"
    ).select("conv_id", F.col("c_uri").alias("uri"), "unit_ord",
             F.col("c_props").alias("props"))
    c_all = c_conv.union(c_cit)
    w_subj = Window.partitionBy("conv_id", "uri")
    c_rows = c_all.withColumn(
        "subj_ord", F.min("unit_ord").over(w_subj)
    ).select(
        "conv_id", "uri", "unit_ord", "subj_ord",
        F.posexplode("props").alias("pos", "p"),
    )
    # dwc:scientificNameAuthorship: first call wins (gg2rdf.ts:555-558)
    w_auth = Window.partitionBy("conv_id", "uri")
    c_rows = c_rows.withColumn(
        "auth_min",
        F.min(
            F.when(F.col("p.pred") == "dwc:scientificNameAuthorship",
                   F.col("unit_ord"))
        ).over(w_auth),
    ).filter(
        (F.col("p.pred") != "dwc:scientificNameAuthorship")
        | (F.col("unit_ord") == F.col("auth_min"))
    )
    parts.append(
        c_rows.select(
            *_row(F.col("conv_id"), BLOCK_CONCEPTS, F.col("subj_ord"),
                  F.col("uri"), F.col("p.pred"), F.col("p.obj"),
                  F.col("unit_ord") * 10000 + F.col("pos"))
        )
    )

    # ---- taxon names (block 5) ----------------------------------------
    n_conv = ok.select(
        "conv_id", F.lit(0).alias("unit_ord"),
        F.explode("concept_name").alias("lvl"),
    )
    n_cit = cits.join(ok.select("conv_id"), "conv_id", "left_semi").select(
        "conv_id", "unit_ord", F.explode("c_name").alias("lvl")
    )
    n_inv = (
        cits.join(
            fold.filter("name_emitted").select("conv_id", "unit_ord"),
            ["conv_id", "unit_ord"], "inner",
        )
        .join(ok.select("conv_id"), "conv_id", "left_semi")
        .select("conv_id", "unit_ord", F.explode("name_if_emitted").alias("lvl"))
    )
    n_all = (
        _union_all([n_conv, n_cit, n_inv])
        .select(
            "conv_id", "unit_ord", F.col("lvl.uri").alias("uri"),
            F.col("lvl.push").alias("push"),
            (F.col("unit_ord") * 1000 + F.col("lvl.lord")).alias("full_ord"),
            F.col("lvl.props").alias("props"),
        )
    )
    vern_rows = verns.join(
        ok.filter(F.col("vern_target").isNotNull())
        .select("conv_id", "vern_target"),
        "conv_id", "inner",
    ).select(
        "conv_id", F.col("vern_target").alias("uri"), F.lit(False).alias("push"),
        (F.lit(500) + F.col("ord")).alias("full_ord"), "props",
    )
    # subject existence + first-push order via ONE window over (conv,
    # uri) — a groupBy+self-join here re-evaluated the whole name-frame
    # lineage twice (measured ~15 s at 20k convs)
    w_push = Window.partitionBy("conv_id", "uri")
    n_rows = (
        n_all.select("conv_id", "uri", "push", "full_ord", "props")
        .union(vern_rows)
        .withColumn(
            "min_push",
            F.min(F.when(F.col("push"), F.col("full_ord"))).over(w_push),
        )
        .filter(F.col("min_push").isNotNull()
                & (F.col("min_push") <= F.col("full_ord")))
        .withColumn("subj_ord", F.col("min_push"))
        .select(
            "conv_id", "uri", "subj_ord", "full_ord",
            F.posexplode("props").alias("pos", "p"),
        )
    )
    parts.append(
        n_rows.select(
            *_row(F.col("conv_id"), BLOCK_NAMES, F.col("subj_ord"),
                  F.col("uri"), F.col("p.pred"), F.col("p.obj"),
                  F.col("full_ord") * 100 + F.col("pos"))
        )
    )

    # ---- figures (block 6) / materials (block 7) ----------------------
    for block, df in ((BLOCK_FIGURES, figs_ok),
                      (BLOCK_MATERIALS,
                       mats_ok.select("conv_id", "ord", "uri", "props"))):
        w = Window.partitionBy("conv_id", "uri")
        rows = df.withColumn("subj_ord", F.min("ord").over(w)).select(
            "conv_id", "uri", "subj_ord", "ord",
            F.posexplode("props").alias("pos", "p"),
        )
        parts.append(
            rows.select(
                *_row(F.col("conv_id"), block, F.col("subj_ord"),
                      F.col("uri"), F.col("p.pred"), F.col("p.obj"),
                      F.col("ord") * 100 + F.col("pos"))
            )
        )

    out = _union_all(parts)
    # D1: Set semantics — dedup per (subject, predicate, object), keeping
    # first-insertion order keys (gg2rdf.ts:24-29)
    return out.groupBy("conv_id", "block", "subj", "pred", "obj").agg(
        F.min("subj_ord").alias("subj_ord"), F.min("obj_ord").alias("obj_ord")
    ).select("conv_id", "block", "subj_ord", "subj", "pred", "obj", "obj_ord")


def status_frame(convs: DataFrame, cits: DataFrame, mats: DataFrame,
                 fold: DataFrame = None) -> DataFrame:
    """Per-conversation Status (max aggregate, gg2rdf.ts:45-50).

    ``fold`` gates the invalid-authority branch's emission-conditional
    makeTaxonName statuses (gg2rdf.ts:1095-1100): they count only for
    units whose trt:citesTaxonName actually emitted (name_emitted)."""
    s_conv = convs.select(
        "conv_id", F.explode("statuses").alias("sev")
    )
    s_fail = convs.filter(
        F.col("missing_document") | F.col("failed_error").isNotNull()
    ).select("conv_id", F.lit(3).alias("sev"))
    ok_ids = convs.filter(
        (~F.col("missing_document")) & F.col("failed_error").isNull()
    ).select("conv_id")
    s_cit = cits.join(ok_ids, "conv_id", "left_semi").select(
        "conv_id", F.explode("statuses").alias("sev")
    )
    s_mat = mats.filter("warn").join(ok_ids, "conv_id", "left_semi").select(
        "conv_id", F.lit(1).alias("sev")
    )
    base = convs.select("conv_id", F.lit(0).alias("sev"))
    out = _union_all([base, s_conv, s_fail, s_cit, s_mat])
    if fold is not None:
        s_nie = (
            cits.join(
                fold.filter("name_emitted").select("conv_id", "unit_ord"),
                ["conv_id", "unit_ord"], "left_semi",
            )
            .join(ok_ids, "conv_id", "left_semi")
            .select("conv_id", F.explode("nie_statuses").alias("sev"))
        )
        out = out.union(s_nie)
    return out.groupBy("conv_id").agg(F.max("sev").alias("status"))
