"""Approximate-nearest-neighbor search over embedding columns.

* :func:`brute_force_topk` — exact cosine top-k via a query×corpus
  join + window rank.  The baseline: one shuffle, O(|Q|·|C|) dot
  products, all JVM-side (``zip_with`` + ``aggregate``).  Correct at
  any scale where |Q| is small (queries broadcast).
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane-style
  LSH where each plane is a deterministic ±1 sign pattern derived from
  dimension parity (engine-portable, no RNG); vectors hash to a
  ``n_bits``-bit bucket, candidates come only from the query's bucket
  (plus Hamming-1 neighbors via multi-probe), then exact cosine ranks
  the candidates.  At 100 TB the bucket join replaces the full cross
  product: cost drops from |Q|·|C| to |Q|·avg_bucket.

The sign planes use dimension-subset sums (plane j = sign of
Σ v[i] over i ≡ j mod n_bits), which DuckDB can mirror exactly for
the oracle — unlike RNG-based hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec):
    return F.sqrt(F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    ))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` is a small DataFrame with the same (id, vec) shape —
    broadcast to avoid shuffling the corpus."""
    corpus = emb.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    scored = corpus.join(F.broadcast(q), F.col("qid") != F.col("cid")) \
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")))
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("cid")  # deterministic tiebreak
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cosine", 6).alias("cosine"), "rank")
    )


def sign_bucket(vec, n_bits: int = 4, table: int = 0, n_tables: int = 8):
    """Deterministic LSH bucket for one hash table: bit j = sign of the
    sum of the dimension group ``i ≡ table*n_bits + j (mod
    n_bits*n_tables)`` — disjoint axis-aligned projections per table
    (engine-portable, no RNG).  A single b-bit bucket has collision
    probability (1-θ/π)^b; multiple tables union their candidates to
    recover recall (standard LSH amplification).

    Cross-engine determinism (round-2 ADVICE): each dimension is
    quantized to int64 (``round(x·10⁶)``) BEFORE summing, so the sign
    test runs on exact integer arithmetic — accumulation order cannot
    flip a near-zero float sum's sign between Spark's left-fold and
    DuckDB's list_sum (float32→double cast and one IEEE multiply are
    bit-identical on both engines; the integer sum is exact)."""
    dim = F.size(vec)
    groups = n_bits * n_tables

    def _mask(g: int):
        # closure factory: pyspark rejects lambdas with default args
        def pick_dim(x, i):
            return F.when(
                i % groups == g,
                F.round(x.cast("double") * 1_000_000).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return pick_dim

    bits = []
    for j in range(n_bits):
        s = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), dim - 1),
                       _mask(table * n_bits + j)),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit(2 ** j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucketed_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Multi-table bucketed ANN: a candidate matches the query's bucket
    in ANY of ``n_tables`` independent sign-hash tables (plus Hamming-1
    multiprobe within each table); candidates are then ranked by exact
    cosine.  Replaces the |Q|·|C| cross product with |Q|·avg_bucket
    per table."""
    tbl_cols_c = [
        sign_bucket(F.col(vec_col), n_bits, t, n_tables).alias(f"cb{t}")
        for t in range(n_tables)
    ]
    corpus = emb.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"), *tbl_cols_c,
    ).withColumn(
        "tb",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("t"), F.col(f"cb{t}").alias("b"))
            for t in range(n_tables)
        ])),
    ).select("cid", "cv", "cn", F.col("tb.t").alias("ct"),
             F.col("tb.b").alias("cb"))
    tbl_cols_q = [
        sign_bucket(F.col(vec_col), n_bits, t, n_tables).alias(f"qb{t}")
        for t in range(n_tables)
    ]
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"), *tbl_cols_q,
    )
    probes = []
    for t in range(n_tables):
        probes.append(F.struct(F.lit(t).alias("t"), F.col(f"qb{t}").alias("b")))
        if multiprobe:
            probes.extend(
                F.struct(
                    F.lit(t).alias("t"),
                    F.col(f"qb{t}").bitwiseXOR(F.lit(1 << j)).alias("b"),
                )
                for j in range(n_bits)
            )
    q = q.withColumn("probe", F.explode(F.array(*probes)))
    scored = corpus.join(
        F.broadcast(q),
        (F.col("probe.t") == F.col("ct")) & (F.col("probe.b") == F.col("cb"))
        & (F.col("qid") != F.col("cid")),
    ).dropDuplicates(["qid", "cid"]).withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cosine", 6).alias("cosine"), "rank")
    )
