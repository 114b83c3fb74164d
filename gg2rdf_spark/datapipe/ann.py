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


def sign_bucket(vec, n_bits: int = 8):
    """Deterministic LSH bucket: bit j = sign of the sum of dimensions
    congruent to j (mod n_bits).  Engine-portable (no RNG)."""
    dim = F.size(vec)

    def _mask(j: int):
        # closure factory: pyspark rejects lambdas with default args
        def pick_dim(x, i):
            return F.when(i % n_bits == j, x.cast("double")).otherwise(F.lit(0.0))
        return pick_dim

    bits = []
    for j in range(n_bits):
        s = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), dim - 1), _mask(j)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit(2 ** j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucketed_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign-bucket (or a
    Hamming-1 neighbor bucket when ``multiprobe``), ranked by exact
    cosine."""
    corpus = emb.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        sign_bucket(F.col(vec_col), n_bits).alias("cb"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        sign_bucket(F.col(vec_col), n_bits).alias("qb"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qb"), *[
                F.col("qb").bitwiseXOR(F.lit(1 << j)) for j in range(n_bits)
            ]
        )
        q = q.withColumn("probe", F.explode(probes))
    else:
        q = q.withColumn("probe", F.col("qb"))
    scored = corpus.join(
        F.broadcast(q),
        (F.col("probe") == F.col("cb")) & (F.col("qid") != F.col("cid")),
    ).withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    ).dropDuplicates(["qid", "cid"])
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cosine", 6).alias("cosine"), "rank")
    )
