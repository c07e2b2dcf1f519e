"""Scalar/column function library (all JVM-side built-ins, codegen-friendly)."""

from jaccard_mapreduce_spark.functions.text import (  # noqa: F401
    normalize_text,
    tokenize,
    tokenize_unique,
    word_ngrams,
    portable_hash64,
)
