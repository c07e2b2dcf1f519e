"""Text normalization / tokenization / analysis column functions.

Everything here is a composition of built-in ``pyspark.sql.functions``
(JVM expressions inside whole-stage codegen) — no Python UDFs.

Tokenization semantics replicate the reference exactly
(DocumentSimilarityMapper.java:80-89 ``tokenizeToUnique``):
lowercase → replace ``[^a-z0-9\\s]`` with space → split on ``\\s+`` →
drop empty tokens → per-document set dedup. Spark's ``regexp_replace`` /
``split`` use the same JVM regex engine, so behavior is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's normalization regex (DocumentSimilarityMapper.java:82).
_NORMALIZE_RE = "[^a-z0-9\\s]"

# Small English stopword list for the language-ID / quality heuristics.
# Public knowledge (standard English function words).
ENGLISH_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "were", "be", "been", "it", "that", "this", "with", "as", "for", "on",
    "at", "by", "from", "not", "but", "have", "has", "had", "they", "you",
    "we", "he", "she", "his", "her", "its", "their", "our", "which", "who",
]


def normalize_text(col: Column | str) -> Column:
    """lowercase, strip non-alphanumerics to spaces, collapse whitespace.

    Mirror of the reference's per-line normalization
    (DocumentSimilarityMapper.java:82-83) minus the split.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), _NORMALIZE_RE, " "))


def tokenize(col: Column | str) -> Column:
    """Normalized token array (duplicates kept, empties removed)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.split(F.regexp_replace(F.lower(c), _NORMALIZE_RE, " "), "\\s+")
    return F.filter(raw, lambda t: t != "")


def tokenize_unique(col: Column | str) -> Column:
    """Per-row token *set* — the reference's ``LinkedHashSet`` dedup
    (DocumentSimilarityMapper.java:84-88). Order is irrelevant downstream,
    so ``array_distinct`` (keeps first occurrence) is an exact analog.
    """
    return F.array_distinct(tokenize(col))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-gram shingles from a token array (space-joined).

    Used by n-gram-Jaccard near-dedup. Pure built-ins: a fold of
    ``zip_with(concat_ws)`` over the n shifted views of the token array.
    The obvious ``transform(sequence(...), i -> concat_ws(slice(t,i,n)))``
    form is ~10x slower — the per-position ``slice`` allocates and copies
    an n-element array per output gram, while ``zip_with`` walks the two
    arrays once (measured at sf0.1: 10.6 s -> 1.1 s to materialize
    bigrams over the documents table).
    """
    if n <= 1:
        return tokens
    # evaluated only under the size guard below (CaseWhen branches are
    # conditionally evaluated per row), so length >= 1 here
    length = F.size(tokens) - (n - 1)
    grams = F.slice(tokens, F.lit(1), length)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(tokens, F.lit(1 + j), length),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def portable_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string, identical across
    engines: first 15 hex digits of md5, parsed base-16.

    Spark: ``conv(substring(md5(x),1,15),16,10)``;
    DuckDB oracle: ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``.
    Used by MinHash/SimHash so signatures are oracle-checkable; a
    production cluster would swap in ``xxhash64`` (see dedup.py
    ``hash_mode='fast'``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count of the raw text (no normalization)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish subword count: alphanumeric runs + punctuation marks each
    count as a token (a cheap, deterministic proxy for a BPE tokenizer's
    token count; useful for corpus budgeting).
    """
    c = F.col(col) if isinstance(col, str) else col
    # count alphanumeric runs
    runs = F.size(F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != ""))
    # count punctuation/symbol characters individually
    punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9\\s]", ""))
    return (runs + punct).cast("long")


def stopword_ratio(tokens: Column) -> Column:
    """Fraction of tokens that are English stopwords (0.0 for empty docs)."""
    n = F.size(tokens)
    hits = F.size(F.filter(tokens, lambda t: t.isin(ENGLISH_STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-whitespace characters that are punctuation/symbols."""
    c = F.col(col) if isinstance(col, str) else col
    nonws = F.length(F.regexp_replace(c, "\\s", ""))
    punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9\\s]", ""))
    return F.when(nonws > 0, punct.cast("double") / nonws.cast("double")).otherwise(
        F.lit(0.0)
    )


def non_ascii_ratio(col: Column | str) -> Column:
    """Fraction of characters outside ASCII — crude script detector."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    ascii_only = F.length(F.regexp_replace(c, "[^\\x00-\\x7F]", ""))
    return F.when(total > 0, (total - ascii_only).cast("double") / total.cast("double")).otherwise(F.lit(0.0))
