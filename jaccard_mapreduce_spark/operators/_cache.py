"""Shared materialization helper for relations consumed more than once.

A relation that feeds both sides of a self-join (or a join side plus
auxiliary aggregates) is otherwise recomputed once per consumer —
including its full tokenize/hash upstream. Measured at sf0.1: 24 s of a
31 s MinHash-LSH run was redundant recompute (docs/SCALE.md,
"Measured-and-adopted"). Pinning is the Spark analog of the reference's
Job-2 intermediate materialization (SURVEY.md O12) applied only where
re-use actually exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Persist a multiply-consumed relation. MEMORY_AND_DISK: these are
    O(#docs) skinny-row relations that spill rather than OOM at cluster
    scale. Re-pinning an already-cached plan is a no-op (CacheManager
    matches by analyzed plan)."""
    from pyspark.storagelevel import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)
