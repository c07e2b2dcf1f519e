from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jaccard_mapreduce_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
REF = "/root/reference"


@pytest.fixture(scope="session")
def spark():
    # modest parallelism for tiny test data; semantics identical to local[32]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    s = get_spark(app_name="jaccard-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
