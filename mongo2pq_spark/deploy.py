"""Ship the engine package to executor Python workers.

Any operator that sends a closure referencing this package into
``mapInPandas``/``applyInPandas`` must call ``ensure_shipped(spark)``
first: cloudpickle serializes module-level functions by reference, so
workers need ``mongo2pq_spark`` importable. Locally that silently
works only when the worker's cwd is the repo root; on a real cluster
it never does. ``addPyFile`` with a package zip covers both — and is
the same mechanism used to deploy this engine to a 1000-executor
cluster (spark-submit --py-files).
"""

from __future__ import annotations

import os
import threading
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()
_LOCK = threading.Lock()  # callers may run in driver thread pools


def ensure_shipped(spark: SparkSession) -> None:
    with _LOCK:
        _ensure_shipped_locked(spark)


def _ensure_shipped_locked(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    from mongo2pq_spark.sources.staging import process_scoped_tmp_path

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = process_scoped_tmp_path("pkg", ".zip")
    with zipfile.ZipFile(zip_path, "w") as bundle:
        for root, _, files in os.walk(pkg_dir):
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    bundle.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
