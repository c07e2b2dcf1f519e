"""Make the package importable on executor Python workers.

Closures passed to ``mapInPandas`` / ``applyInPandasWithState`` are
cloudpickled *by reference* to this module — workers must be able to
import ``jaccard_mapreduce_spark``. On a real cluster you'd ship a wheel
via ``--py-files``; here we zip the package once per session and
``addPyFile`` it, which works no matter who created the SparkSession
(the driver harness creates its own).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[str] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"jaccard_mapreduce_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _shipped.add(app_id)
