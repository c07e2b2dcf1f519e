"""Custom PySpark DataSource: deterministic synthetic corpus generator.

The Spark-native answer to the reference's driver-side generator script
(datagen.py:11-55 — seeded topic-model-ish docs: per-doc topic, 70%
topic-local / 30% global vocabulary): instead of one Python process
writing a text file, the corpus is a *table* produced by a registered
``DataSource`` — generation is partition-parallel on executors, and at
cluster scale a 10^9-doc corpus materializes with zero data movement
(each task generates its slice; no driver bottleneck, no file staging).

Determinism is partition-INDEPENDENT by construction: every row derives
only from ``(seed, doc_id)`` (a per-doc ``random.Random`` stream), never
from partition boundaries or row order — so any parallelism produces the
identical corpus, which the tests assert. The streaming variant replays
the same derivation per offset range, so a restarted query regenerates
identical micro-batches (exactly-once friendly).

Schema matches the ``documents`` test table, so every text/dedup/Jaccard
operator runs on generated data unchanged.
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SYNTHETIC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]


def _doc_row(
    doc_id: int,
    seed: int,
    n_topics: int,
    tokens_per_doc: int,
    vocab_topic: int,
    vocab_global: int,
) -> tuple:
    """One document, derived ONLY from (seed, doc_id)."""
    rng = random.Random(f"{seed}:{doc_id}")
    topic = rng.randrange(n_topics)
    words = []
    for _ in range(tokens_per_doc):
        if rng.random() < 0.7:
            words.append(f"w{topic * vocab_topic + rng.randrange(vocab_topic):04d}")
        else:
            words.append(f"g{rng.randrange(vocab_global):04d}")
    text = " ".join(words)
    lang = _LANGS[rng.randrange(len(_LANGS))]
    return (doc_id, text, lang, f"topic{topic}", len(text))


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _Params:
    """Option parsing shared by the batch and stream readers."""

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 6190))
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_topics = int(options.get("n_topics", 8))
        self.tokens_per_doc = int(options.get("tokens_per_doc", 50))
        self.vocab_topic = int(options.get("vocab_topic", 200))
        self.vocab_global = int(options.get("vocab_global", 500))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.docs_per_batch = int(options.get("docs_per_batch", 100))

    def row(self, doc_id: int) -> tuple:
        return _doc_row(
            doc_id,
            self.seed,
            self.n_topics,
            self.tokens_per_doc,
            self.vocab_topic,
            self.vocab_global,
        )


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.p = _Params(options)

    def partitions(self) -> Sequence[InputPartition]:
        n, parts = self.p.n_docs, self.p.n_partitions
        step = max(1, (n + parts - 1) // parts)
        return [_Range(s, min(s + step, n)) for s in range(0, n, step)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield self.p.row(doc_id)


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """Bounded replayable stream: each micro-batch is the next
    ``docs_per_batch`` ids; ``readBetweenOffsets`` regenerates any range
    identically (deterministic replay — the exactly-once contract)."""

    def __init__(self, options: dict):
        self.p = _Params(options)

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.p.docs_per_batch, self.p.n_docs)
        rows = [self.p.row(i) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([self.p.row(i) for i in range(start["next"], end["next"])])


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return SYNTHETIC_SCHEMA

    def reader(self, schema: StructType) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticCorpusStreamReader:
        return SyntheticCorpusStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Register the source (executors must be able to import this module
    — call ``shiplib.ensure_package_on_workers`` first in shipped jobs)."""
    spark.dataSource.register(SyntheticCorpusDataSource)
