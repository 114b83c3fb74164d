"""Text-analysis operators for corpus curation (all JVM-side exprs).

* :func:`language_id` — stopword-ratio n-gram heuristic language guess.
* :func:`quality_score` — length / punctuation / stopword / word-length
  quality features + a composite score (filtering columns for a
  training-data pipeline).
* :func:`token_stats` — whitespace tokens + a BPE-ish subword estimate
  (chars/4 heuristic + punctuation splits).
* :func:`fingerprint` — document fingerprint: minimum of the portable
  32-bit hashes of the document's word 8-grams (winnowing-style
  min-sampling; equal fingerprints ⇒ likely shared content).

Every operator has an exact DuckDB oracle (same expressions in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _h32, shingles, tokens

EN_STOP = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]
DE_STOP = ["der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"]
FR_STOP = ["le", "la", "les", "et", "de", "un", "une", "est", "dans", "pour"]


def _stop_count(tok_col, words: list[str]):
    return F.size(F.array_intersect(tok_col, F.array(*[F.lit(w) for w in words])))
    # note: counts distinct stopword TYPES (set-intersect), cheap and
    # portable; ratio below uses distinct-token count accordingly


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    toks = F.array_distinct(tokens(F.col(text_col)))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("t"))
    scored = base.select(
        "id",
        _stop_count(F.col("t"), EN_STOP).alias("en"),
        _stop_count(F.col("t"), DE_STOP).alias("de"),
        _stop_count(F.col("t"), FR_STOP).alias("fr"),
    )
    return scored.select(
        "id", "en", "de", "fr",
        F.when((F.col("en") >= F.col("de")) & (F.col("en") >= F.col("fr"))
               & (F.col("en") > 0), "en")
        .when((F.col("de") >= F.col("fr")) & (F.col("de") > 0), "de")
        .when(F.col("fr") > 0, "fr")
        .otherwise("und").alias("lang_guess"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_types = _stop_count(F.array_distinct(toks), EN_STOP)
    mean_word = (
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)) / n_tokens
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        stop_types.alias("stop_types"),
        F.round(mean_word, 6).alias("mean_word_len"),
        F.round(
            F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
            + F.least(stop_types / F.lit(5.0), F.lit(1.0)) * 0.4
            + F.when((mean_word >= 3) & (mean_word <= 10), 0.2)
            .otherwise(0.0),
            6,
        ).alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(text), r"\s+"))
    # BPE-ish estimate: word pieces ≈ words + ceil(chars/4) blend
    subword_est = F.ceil(
        F.length(F.regexp_replace(text, r"\s+", "")) / F.lit(4.0)
    )
    return docs.select(
        F.col(id_col).alias("id"),
        ws_tokens.alias("ws_tokens"),
        subword_est.cast("long").alias("subword_est"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Min-hash-of-8-grams document fingerprint."""
    sh = shingles(tokens(F.col(text_col)), n)
    return docs.select(
        F.col(id_col).alias("id"),
        F.array_min(F.transform(sh, _h32)).alias("fingerprint"),
    )
