"""Round-8 additions: fast-rerank id-mismatch guard, compaction
marker ordering, and the Z-order demo's build-once gate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_fast_rerank_missing_id_raises_not_corrupts(spark):
    """ADVICE r7: the dense-LUT resolver filled absences with -1, and a
    candidate id absent from the vector relation would silently gather
    the LAST matrix row (a wrong score) while the dict fallback raised.
    Both paths must now fail loudly."""
    from pyspark.errors.exceptions.captured import PythonException

    from jaccard_mapreduce_spark.operators.similarity import (
        _score_pairs_fast,
        vectors,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    v = vectors(emb)
    cand = spark.createDataFrame(
        [(0, 5), (1, 99)], "query_id long, neighbor_id long"
    )
    with pytest.raises(PythonException, match="absent"):
        _score_pairs_fast(cand, v).collect()


def test_compact_minhash_stamps_banding_before_swap(spark, tmp_path):
    """ADVICE r7: the _banding marker must ride INSIDE the rewritten
    buckets dataset through the publish rename (reband's ordering), not
    be re-stamped after the swap — a crash in between would leave the
    store falling back to a possibly-stale _params banding."""
    from jaccard_mapreduce_spark.sources.signature_index import (
        _stored_params,
        build_minhash_index,
        compact_minhash_index,
    )
    from jaccard_mapreduce_spark.sources.vector_index import (
        _fs_read_text,
        _fs_write_text,
    )

    base = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc{i}") for i in range(40)],
        "doc_id long, text string",
    )
    build_minhash_index(docs, base, bands=8)
    # corrupt the external metadata copy: after compaction the
    # in-dataset marker must still win (it is the authoritative copy)
    _fs_write_text(spark, f"{base}/_params", '{"k": 32, "bands": 4, "seed": 42}')
    compact_minhash_index(spark, base)
    assert _fs_read_text(spark, f"{base}/buckets/_banding").strip() == "8"
    assert _stored_params(spark, base)["bands"] == 8


def test_compact_pre_swap_hook_sees_tmp_before_publish(spark, tmp_path):
    from jaccard_mapreduce_spark.sources.vector_index import (
        _compact_datasets,
    )

    base = str(tmp_path / "idx")
    spark.range(100).write.parquet(f"{base}/rows")
    seen: list[tuple[bool, bool]] = []

    def hook(tmp: str) -> None:
        # called after the tmp rewrite lands but before the swap: both
        # generations exist, the live path still holds the OLD one
        seen.append(
            (tmp.endswith("rows__compacting"), os.path.isdir(f"{base}/rows"))
        )
        assert os.path.isdir(tmp)

    _compact_datasets(
        spark, base, ("rows",), "a test index", 1, 1 << 27,
        pre_swap={"rows": hook},
    )
    assert seen == [(True, True)]


def test_bands_for_derives_the_shipped_default():
    """S-curve midpoint (1/b)^(b/k): fewest bands whose midpoint sits
    at or below the dedup threshold. The shipped 8-band default at
    k=32 / threshold 0.7 must be the derived point."""
    from jaccard_mapreduce_spark.sources.signature_index import bands_for

    assert bands_for(32, 0.7) == 8
    assert bands_for(32, 0.9) == 4  # higher threshold -> fewer bands
    assert bands_for(32, 0.3) == 16  # lower threshold -> more bands
    assert bands_for(32, 1.0) == 1  # exact-match regime
    assert bands_for(32, 0.01) == 32  # below every midpoint -> max bands
    assert 32 % bands_for(32, 0.55) == 0
    with pytest.raises(ValueError):
        bands_for(32, 0.0)


def test_minhash_index_stats_reports_occupancy(spark, tmp_path):
    from jaccard_mapreduce_spark.sources.signature_index import (
        build_minhash_index,
        minhash_index_stats,
    )

    base = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc{i % 4}") for i in range(24)],
        "doc_id long, text string",
    )
    build_minhash_index(docs, base, bands=8)
    st = minhash_index_stats(spark, base)
    assert st["n_docs"] == 24
    # compare against a direct computation over the stored buckets
    # (near-identical texts share cells in some bands, so the group
    # count is data-dependent — measure, don't hand-derive)
    occ = {}
    for r in spark.read.parquet(f"{base}/buckets").collect():
        occ[(r["band"], r["bucket"])] = occ.get((r["band"], r["bucket"]), 0) + 1
    assert st["n_bucket_groups"] == len(occ)
    assert st["max_bucket_docs"] == max(occ.values())
    # every distinct text has 6 copies, which always share all cells
    assert st["max_bucket_docs"] >= 6


def test_ivf_sq8_search_prunes_float_vectors_from_the_scan(spark):
    """The SQ8 serving path's whole point: the stored-side rerank reads
    the 1-byte codes + scalars, never the float64 vectors — the scan of
    the cells dataset must prune ``vec`` and ``norm2`` and keep
    ``qcode``. Also: the quantized score is pure column arithmetic, no
    Python anywhere in the plan."""
    from jaccard_mapreduce_spark.sources.vector_index import (
        ivf_index_sq8_demo,
    )

    df = ivf_index_sq8_demo(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    cells_scans = [
        line
        for line in plan.splitlines()
        if "FileScan" in line and "/cells" in line
    ]
    assert cells_scans, "expected a FileScan over the cells dataset"
    import re

    for line in cells_scans:
        rs = line.split("ReadSchema:", 1)[1]
        assert re.search(r"[<,]qcode:", rs)
        assert not re.search(r"[<,]vec:", rs)
        assert not re.search(r"[<,]norm2:", rs)


def test_ivf_sq8_search_refuses_codeless_index(spark, tmp_path):
    import pytest as _pytest

    from pyspark.sql import functions as _F

    from jaccard_mapreduce_spark.sources.vector_index import (
        build_ivf_index,
        search_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(64)
    base = str(tmp_path / "idx")
    build_ivf_index(emb, base, n_cells=4)
    # simulate a pre-round-8 layout: rewrite cells without the codes
    cells = spark.read.parquet(f"{base}/cells").drop(
        "qcode", "scale", "zp", "qsum", "qnorm2"
    ).localCheckpoint(eager=True)
    cells.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{base}/cells"
    )
    with _pytest.raises(ValueError, match="without stored SQ8"):
        search_ivf_index(spark, base, emb, rerank="sq8")
    # the exact tier still serves the old layout
    assert search_ivf_index(spark, base, emb, k=3).count() > 0


def test_zorder_demo_reuses_layout_across_calls(spark):
    """ADVICE r7: the Z-ordered copy must be written once per
    (session, fixture) and reused — bench reps and driver re-reads
    should measure the pruned scan, not the re-layout write."""
    from jaccard_mapreduce_spark.sources.vector_index import _scratch_dir
    from jaccard_mapreduce_spark.sources.zorder import (
        zordered_events_summary,
    )

    first = zordered_events_summary(spark, SF_ORACLE).collect()
    base = _scratch_dir(spark, suffix="_zorder")
    marker = os.path.join(base, "_built_for")
    stamp = os.stat(marker).st_mtime_ns
    files = sorted(os.listdir(base))
    second = zordered_events_summary(spark, SF_ORACLE).collect()
    assert os.stat(marker).st_mtime_ns == stamp
    assert sorted(os.listdir(base)) == files
    key = lambda r: r["event_type"]  # noqa: E731
    assert sorted(first, key=key) == sorted(second, key=key)
