"""Text-analysis operators for a training-data pipeline.

Language ID, quality scoring, token counting, and document
fingerprinting over a documents table. All pure built-in column
expressions (whole-stage codegen; no UDFs), and every float output is a
fixed-order combination of exact integer ratios so the DuckDB oracle
hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_mapreduce_spark.functions.text import (
    ENGLISH_STOPWORDS,
    non_ascii_ratio,
    normalize_text,
    portable_hash64,
    punct_ratio,
    stopword_ratio,
    token_count_bpe_ish,
    token_count_ws,
    tokenize,
)


def token_counts(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish subword token counts per document."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        token_count_ws(text_col).cast("long").alias("n_ws_tokens"),
        token_count_bpe_ish(text_col).alias("n_subword_tokens"),
    )


def text_stats(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality statistics + composite quality score.

    quality_score = (len_score + alpha_score + stop_score) / 3 where
      len_score   = min(n_tokens / 100, 1)      — enough content
      alpha_score = 1 - punct_ratio             — not symbol soup
      stop_score  = min(stopword_ratio / 0.4, 1) — looks like prose
    """
    toks = tokenize(text_col)
    n_tokens = F.size(toks).cast("long")
    stop = stopword_ratio(toks)
    punct = punct_ratio(text_col)
    len_score = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    alpha_score = F.lit(1.0) - punct
    stop_score = F.least(stop / F.lit(0.4), F.lit(1.0))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        stop.alias("stopword_ratio"),
        punct.alias("punct_ratio"),
        ((len_score + alpha_score + stop_score) / F.lit(3.0)).alias("quality_score"),
    )


def lang_id(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English stopword hit-rate + ASCII ratio.

    Deterministic n-gram-free heuristic (a real pipeline would plug a
    fastText-style model in via a Pandas UDF; the *operator contract* —
    doc_id -> (lang_pred, lang_score) — is what matters here).
    """
    toks = tokenize(text_col)
    stop = stopword_ratio(toks)
    nonascii = non_ascii_ratio(text_col)
    pred = (
        F.when(F.size(toks) == 0, F.lit("unknown"))
        .when(nonascii > 0.3, F.lit("non_latin"))
        .when(stop >= 0.05, F.lit("en"))
        .otherwise(F.lit("other_latin"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        stop.alias("lang_score"),
    )


def fingerprints(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of the *normalized* text (whitespace/
    case/punctuation-insensitive) + a compact 60-bit integer hash."""
    norm = normalize_text(text_col)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm.cast("binary")).alias("fingerprint"),
        portable_hash64(norm).alias("fingerprint64"),
    )


def quality_filter(
    documents: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus quality gate — the keep/drop decision a training-data
    pipeline runs after scoring: keep docs with quality_score >=
    ``min_quality`` AND >= ``min_tokens`` tokens. Returns the scored
    relation with a ``keep`` flag (filtering is the caller's one-liner,
    keeping the operator side-effect-free and auditable)."""
    scored = text_stats(documents, id_col, text_col)
    return scored.withColumn(
        "keep",
        (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens),
    )


def doc_split(
    documents: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-free id hash:
    bucket = portable_hash64(salt || doc_id) mod 100. Stable across runs,
    machines, and engines (oracle-checkable); re-salting produces an
    independent split. No shuffle — a pure projection."""
    bucket = portable_hash64(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ) % 100
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


def shard_assign(
    documents: DataFrame,
    n_shards: int = 64,
    salt: str = "shard-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic output-shard assignment (hash mod n_shards) with a
    stable intra-shard order key — the projection that feeds
    ``write.partitionBy('shard')`` when exporting training shards.
    Hash-based assignment balances shards regardless of id distribution
    and needs no global sort or coordination."""
    h = portable_hash64(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        (h % n_shards).alias("shard"),
        h.alias("order_key"),
    )


__all__ = [
    "token_counts",
    "text_stats",
    "lang_id",
    "fingerprints",
    "quality_filter",
    "doc_split",
    "shard_assign",
    "ENGLISH_STOPWORDS",
]
