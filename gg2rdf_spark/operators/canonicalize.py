"""Canonicalization — connected components over alias edges.

north_rule stage 3: same-URI subject merge is already relational
(dropDuplicates, triples.py); *alias* edges discovered by entity
linking (two URIs naming the same entity) need union-find.  Spark has
no built-in CC, and GraphFrames is an external package — so this is a
hand-rolled iterative smallest-label propagation via DataFrame
self-joins (SURVEY.md §4 item 2):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Converges in O(diameter) rounds — O(log n) with
the large-star-ish shortcut of propagating labels, and each round
``localCheckpoint``s to truncate lineage (otherwise the plan doubles
every iteration and the driver OOMs planning round ~20).

The output maps every node to its component's minimum label — the
canonical representative.  ``canonical_triples`` then rewrites
subjects/objects through that mapping (an optional mode: the
reference-parity triple set is *not* rewritten, P/R is scored on the
un-collapsed graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    max_iter: int = 30, rows_per_partition: int = 250_000,
) -> DataFrame:
    """Returns (node, component) with component = min node id (by
    string/natural ordering) reachable from node.

    The label-propagation loop runs ~4 shuffles per round over frames
    no larger than the edge list — usually 100-1000× smaller than the
    triple stream that produced the alias edges.  With AQE partition
    coalescing disabled session-wide (session.py), those shuffles
    would otherwise run at the full session width (32+ tasks over a
    few k rows, ~6 rounds deep).  So the loop sizes a shuffle width
    from the measured edge count and applies it EXPLICITLY with
    ``repartition(width, key)`` at every shuffle boundary — never by
    mutating ``spark.sql.shuffle.partitions``, which is session-global
    and therefore races every concurrently-built plan (the eager-cache
    waves submit jobs from a thread pool, and several operators read
    that conf at plan-build time; round-4 ADVICE).  Because both sides
    of each join arrive hash-partitioned on the join key at the SAME
    width, EnsureRequirements elides any extra exchange, so the loop's
    shuffles run at exactly ``width`` regardless of the session
    setting.  At 100 TB the edge list is large and the width scales
    with it (cap: the session width).
    """
    spark = edges.sparkSession
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .repartition(session_width, "a", "b")
        .distinct()
        .persist()
    )
    n_edges = sym.count()  # also materializes the persist
    width = max(4, min(session_width, -(-n_edges // rows_per_partition)))
    # re-lay the (persisted) edge frame once on the join key at the
    # loop width: every per-round join against it is then exchange-free
    # on the edge side
    sym_b = sym.repartition(width, "b").persist()
    sym_b.count()
    sym.unpersist()
    try:
        return _cc_loop(sym_b, max_iter, width)
    finally:
        sym_b.unpersist()


def _label_checksum(labels: DataFrame):
    """Order-insensitive fingerprint of the (node, component) frame.

    Convergence detection: labels only ever DECREASE (least/min), so
    the assignment changed between rounds iff the multiset of pairs
    changed — compared via one cheap agg job over the checkpointed
    frame (sum of per-row xxhash64) instead of the previous
    join-new-against-old + count, which cost two repartition
    exchanges and a join per round.  A sum collision would need two
    different label states to cancel exactly in a 64-bit sum —
    negligible, and the failure mode is one early loop exit on a
    frame the caller still sees as (node, component)."""
    return labels.agg(
        # decimal sum: a long sum overflows under ANSI mode (Spark 4
        # default) once a few rows' hashes share a sign
        F.sum(F.xxhash64("node", "component").cast("decimal(38,0)"))
        .alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def _cc_loop(sym_b: DataFrame, max_iter: int, width: int) -> DataFrame:
    labels = (
        sym_b.select(F.col("a").alias("node"))
        .repartition(width, "node")
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    prev = _label_checksum(labels)
    for _ in range(max_iter):
        # neighbor-min step: label(v) ← min over neighbors u of label(u)
        nbr = (
            sym_b.join(
                labels.withColumnRenamed("node", "b")
                .repartition(width, "b"),
                "b",
            )
            .repartition(width, "a")
            .groupBy("a").agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("a", "node")
        )
        stepped = (
            labels.repartition(width, "node")
            .join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            # feeds BOTH sides of the pointer-jump self-join below;
            # unpersisted, the neighbor-min lineage runs twice per
            # round (once per join side — they shuffle in separate
            # stages of the same checkpoint job)
            .persist()
        )
        # pointer-jump (path halving): label(v) ← label(label(v)) —
        # turns O(diameter) convergence into O(log diameter) (a chain
        # of 30 converged in 30 rounds before; ~6 after)
        comp_map = stepped.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        ).repartition(width, "c_node")
        new_labels = (
            stepped.repartition(width, "component")
            .join(
                comp_map, F.col("component") == comp_map["c_node"], "left"
            )
            .select(
                F.col("node"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("c_comp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage every round
        )
        stepped.unpersist()
        cur = _label_checksum(new_labels)
        labels = new_labels
        if cur == prev:
            break
        prev = cur
    return labels


def canonical_map(labels: DataFrame) -> DataFrame:
    """(alias_uri, canonical_uri) pairs, identity rows dropped."""
    return labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("alias_uri"),
        F.col("component").alias("canonical_uri"),
    )


def canonical_triples(triples: DataFrame, labels: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the component map (broadcast when the
    alias set is small — it usually is relative to the triple set)."""
    m = F.broadcast(canonical_map(labels))
    t = triples
    t = (
        t.join(m.withColumnRenamed("alias_uri", "subj"), "subj", "left")
        .withColumn("subj", F.coalesce("canonical_uri", "subj"))
        .drop("canonical_uri")
    )
    t = (
        t.join(m.withColumnRenamed("alias_uri", "obj"), "obj", "left")
        .withColumn("obj", F.coalesce("canonical_uri", "obj"))
        .drop("canonical_uri")
    )
    return t.dropDuplicates(["conv_id", "subj", "pred", "obj"])
