"""Multi-format source/sink round-trip — ORC, JSON-lines, CSV.

The reference's only interchange surface is the text-file sink/rescan
between its MapReduce jobs (DocumentSimilarityDriver.java:43-45, O12/O19
in SURVEY.md §2). A Spark engine's equivalent surface is the DataSource
API: every table should survive a write → read cycle through the
row-oriented interchange formats, byte-losslessly, with an EXPLICIT
schema on read (schema inference re-reads the data — wrong at 100 TB).

``formats_roundtrip`` proves that end-to-end, the same way the golden
tests prove the text sink: write the ``events`` table (the hardest
schema — BIGINT keys, microsecond timestamps, DOUBLE measures, embedded
JSON strings with quotes/commas) through each format, read it back, and
join it row-by-row against the parquet original with null-safe equality
on every column. The graded projection is integer-only — row counts and
per-column mismatch counts (expected 0) — so the verification is immune
to float-ordering hazards while still proving the doubles and the
microsecond timestamps survived the text formats bit-for-bit
(per-row ``<=>`` comparison, not an order-dependent aggregate).

Format notes (each a real pitfall at scale):
- CSV needs an explicit ``nullValue`` sentinel (default writes null as
  empty string, reads empty string back as null — ambiguous against
  real empty strings) and an explicit 6-digit ``timestampFormat``
  (default keeps only milliseconds: silent µs truncation).
- JSON needs the same ``timestampFormat``; Jackson's shortest-roundtrip
  double rendering is lossless, as is Spark's CSV double writer.
- ORC is columnar/binary: types survive natively; it exercises the
  non-parquet columnar path (predicate pushdown etc. come free).

Storage hygiene: deterministic per-session scratch dir (derived from
the Spark application id), cleared at the start of each invocation —
same convention as the bucketed-layout demo (ADVICE r3).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_NULL = "\\N"


def _scratch_dir(spark: SparkSession) -> str:
    app = re.sub(r"[^a-zA-Z0-9]+", "_", spark.sparkContext.applicationId)
    return os.path.join(tempfile.gettempdir(), f"formats_demo_{app}".lower())


def _text_options(w):
    # events.ts is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false), which
    # reads/writes through timestampNTZFormat — the plain timestampFormat
    # option silently does NOT apply to NTZ columns (µs truncated to the
    # default [.SSS] pattern). Set both so either flavor round-trips.
    return (
        w.option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .option("nullValue", _NULL)
    )


def formats_roundtrip(
    spark: SparkSession, sf_dir: str, formats: tuple[str, ...] = ("orc", "json", "csv")
) -> DataFrame:
    """Write ``events`` through each format, read back with an explicit
    schema, and return one row per format:
    ``(fmt, n_rows, n_key_mismatch, n_ts_mismatch, n_value_mismatch,
    n_props_mismatch)`` — all mismatch counts must be 0 (the oracle
    pins them there, with ``n_rows`` = the table's row count)."""
    base = _scratch_dir(spark)
    shutil.rmtree(base, ignore_errors=True)

    orig = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = orig.schema

    per_format = []
    for fmt in formats:
        path = os.path.join(base, fmt)
        w = orig.write.mode("overwrite").format(fmt)
        if fmt in ("json", "csv"):
            w = _text_options(w)
        if fmt == "csv":
            w = w.option("header", "true").option("escape", '"')
        w.save(path)

        r = spark.read.format(fmt).schema(schema)
        if fmt in ("json", "csv"):
            r = _text_options(r)
        if fmt == "csv":
            r = r.option("header", "true").option("escape", '"')
        back = r.load(path)

        a = orig.alias("a")
        b = back.alias("b")
        joined = a.join(b, F.col("a.event_id") == F.col("b.event_id"), "full")

        def _mism(col: str):
            return F.sum(
                (~F.col(f"a.{col}").eqNullSafe(F.col(f"b.{col}"))).cast("long")
            )

        per_format.append(
            joined.agg(
                F.lit(fmt).alias("fmt"),
                F.count(F.lit(1)).alias("n_rows"),
                _mism("user_id").alias("n_key_mismatch"),
                _mism("ts").alias("n_ts_mismatch"),
                _mism("value").alias("n_value_mismatch"),
                _mism("props").alias("n_props_mismatch"),
            )
        )

    out = per_format[0]
    for df in per_format[1:]:
        out = out.unionByName(df)
    return out
