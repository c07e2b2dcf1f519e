"""The SQL surface must expose the operator inventory to plain
``spark.sql`` with the same results as the Python API, and user SQL over
the views must still optimize (pushdown through view expansion)."""

from __future__ import annotations

import pytest

from jaccard_mapreduce_spark import sql as sqlmod
from jaccard_mapreduce_spark.operators import jaccard as J
from jaccard_mapreduce_spark.sources.corpus import read_documents

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    names = sqlmod.register_all(spark, SF_ORACLE)
    assert "jaccard_pairs" in names and "lineitem" in names
    return names


def test_sql_matches_python_api(spark):
    via_sql = spark.sql(
        "SELECT doc_a, doc_b, similarity FROM jaccard_pairs "
        "WHERE similarity >= 0.9"
    )
    via_api = J.jaccard_threshold(
        J.jaccard_pairs(read_documents(spark, SF_ORACLE)), 0.9
    ).select("doc_a", "doc_b", "similarity")
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_api.collect())
    )


def test_sql_join_across_views(spark):
    row = spark.sql(
        """
        SELECT count(*) AS n
        FROM exact_duplicates d JOIN text_stats s USING (doc_id)
        WHERE d.is_dup AND s.n_tokens > 0
        """
    ).first()
    assert row["n"] >= 0


def test_view_pushdown_reaches_scan(spark):
    plan = (
        spark.sql("SELECT doc_id FROM text_stats WHERE doc_id = 7")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the doc_id predicate must reach the parquet scan under the view
    assert "PushedFilters" in plan
    assert "doc_id" in plan.split("PushedFilters", 1)[1][:200]
