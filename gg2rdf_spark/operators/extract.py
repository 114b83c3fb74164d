"""Stage 1 — mention extraction (SURVEY.md §2 rows A2-A3, B1-B2).

``parse_mentions`` is the Arrow-vectorized analog of the reference's
DOM parse + CSS selections (gg2rdf.ts:57-60, :136-138, :327-339): a
``mapInPandas`` over transcript turns.  The pipeline's one
full-stream exchange is the TURN repartition by conv_id feeding it
(round 4; previously a mention-level row_number window — ~15× more
rows exchanged AND sorted).  On an Iceberg table already bucketed by
conv_id the exchange disappears entirely (storage-partitioned scan).

Downstream conv-level frames (``docs_frame``, ``treatment_taxon``)
are hash aggregates on ``conv_id`` — map-side partial aggregation
keeps their shuffles conv-level (small).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, MapType, StringType, StructField, StructType,
)

from ..functions.markup import parse_turn

MENTION_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("start", IntegerType()),
    StructField("kind", StringType()),
    StructField("section", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
    StructField("surface", StringType()),
])

# parse output: MENTION_SCHEMA + the per-conversation document-order
# counter (assigned inside the parse; see parse_mentions docstring)
PARSED_SCHEMA = StructType(
    MENTION_SCHEMA.fields + [StructField("g_ord", IntegerType())]
)


def parse_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts → one row per mention span, with a per-conversation
    global document-order column ``g_ord``.

    The pipeline's ONE full-stream shuffle happens here — but on the
    RAW TURNS, not the parsed mentions: turns are repartitioned by
    conv_id and sorted by turn_idx within partitions, and the
    Arrow-batched parse then assigns ``g_ord`` with a running
    per-conversation counter.  Semantics are identical to the previous
    ``row_number() over (partitionBy conv_id orderBy turn_idx, start)``
    window because ``parse_turn`` emits mentions in strictly
    increasing ``start`` order (regex finditer) — but the exchange
    and sort now touch ~15× fewer rows (turns vs mentions) and the
    mention-level window sort disappears entirely.  At 10^12-turn
    scale this is the difference between sorting the mention stream
    and sorting the (already conv_id-bucketed, per Iceberg layout)
    turn stream.  Hot-conversation skew lands on single partitions
    exactly as the window form did (same key)."""
    from .grouped import scaled_partitions

    par = scaled_partitions(transcripts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_conv = None
        ctr = 0
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if conv_id != cur_conv:
                    cur_conv, ctr = conv_id, 0
                for m in parse_turn(text, int(turn_idx)):
                    ctr += 1
                    rows.append(
                        (conv_id, int(turn_idx), m.start, m.kind, m.section,
                         m.attrs, m.surface, ctr)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PARSED_SCHEMA.fields]
            )

    return (
        transcripts.select("conv_id", "turn_idx", "text")
        .repartition(par, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .mapInPandas(gen, PARSED_SCHEMA)
    )


def docs_frame(transcripts: DataFrame, mentions: DataFrame) -> DataFrame:
    """Per-conversation document/MODS attribute bags (≙ <document> attr
    bag + MODS subtree, gg2rdf.ts:75-82, :969-1011).  ``doc_attrs`` is
    null when the conversation lacks a [[document]] span (→ failed,
    gg2rdf.ts:76-80)."""
    meta = (
        mentions.filter(F.col("kind").isin("document", "mods"))
        .groupBy("conv_id")
        .agg(
            F.min_by(
                F.when(F.col("kind") == "document", F.col("attrs")),
                F.when(
                    F.col("kind") == "document",
                    F.struct("turn_idx", "start"),
                ),
            ).alias("doc_attrs"),
            F.min_by(
                F.when(F.col("kind") == "mods", F.col("attrs")),
                F.when(
                    F.col("kind") == "mods", F.struct("turn_idx", "start")
                ),
            ).alias("mods_attrs"),
        )
    )
    convs = transcripts.select("conv_id").distinct()
    return convs.join(meta, "conv_id", "left")


def treatment_taxon(mentions: DataFrame) -> DataFrame:
    """First nomenclature taxonomicName per conversation
    (gg2rdf.ts:136-138) plus the taxonomicNameLabel status fallback
    (:249-254): first label *after* the taxon in the same turn, else a
    same-turn label whose rank matches the taxon's."""
    tt = (
        mentions.filter(
            (F.col("kind") == "taxonomicName")
            & (F.col("section") == "nomenclature")
        )
        .groupBy("conv_id")
        .agg(
            F.min_by(F.col("attrs"), F.col("g_ord")).alias("tt_attrs"),
            F.min_by(F.col("turn_idx"), F.col("g_ord")).alias("tt_turn"),
            F.min_by(F.col("start"), F.col("g_ord")).alias("tt_start"),
        )
    )
    labels = mentions.filter(F.col("kind") == "taxonomicNameLabel").select(
        F.col("conv_id").alias("lb_conv_id"),
        F.col("turn_idx").alias("lb_turn"),
        F.col("start").alias("lb_start"),
        F.col("attrs")["rank"].alias("lb_rank"),
        F.col("surface").alias("lb_text"),
    )
    joined = tt.join(
        labels,
        (F.col("conv_id") == F.col("lb_conv_id"))
        & (F.col("tt_turn") == F.col("lb_turn")),
        "left",
    ).drop("lb_conv_id")
    agg = joined.groupBy("conv_id", "tt_attrs", "tt_turn", "tt_start").agg(
        F.min_by(
            F.when(F.col("lb_start") > F.col("tt_start"), F.col("lb_text")),
            F.when(F.col("lb_start") > F.col("tt_start"), F.col("lb_start")),
        ).alias("label_after"),
        F.min_by(
            F.when(
                F.col("lb_rank") == F.col("tt_attrs")["rank"], F.col("lb_text")
            ),
            F.when(
                F.col("lb_rank") == F.col("tt_attrs")["rank"], F.col("lb_start")
            ),
        ).alias("label_rank"),
    )
    # status resolution: @status ?? sibling label ?? rank label ?? ABSENT
    # (?? is null-coalescing: an *empty* status attribute still wins)
    return agg.withColumn(
        "tt_status",
        F.coalesce(
            F.col("tt_attrs")["status"],
            F.col("label_after"),
            F.when(F.col("tt_attrs")["rank"].isNotNull(), F.col("label_rank")),
            F.lit("ABSENT"),
        ),
    )
