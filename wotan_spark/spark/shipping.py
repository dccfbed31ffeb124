"""Ship the engine package to executor Python workers.

On a cluster this is ``spark-submit --py-files engine.zip``; for driver
processes that created their own SparkSession (the graft driver, notebooks),
``ensure_shipped`` reproduces the same thing at runtime: zip the package
once and ``addPyFile`` it so UDF deserialization can import ``wotan_spark``
on every worker regardless of the driver's working directory.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip wotan_spark for --py-files / addPyFile."""
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(),
                            f"wotan_spark_pyfiles_{os.getpid()}.zip")
    if not os.path.exists(dest):
        tmp = dest + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            pkgroot = os.path.join(_REPO, "wotan_spark")
            for dirpath, _, files in os.walk(pkgroot):
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, _REPO))
        os.replace(tmp, dest)
    return dest


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(build_pyfiles_zip())
    _SHIPPED.add(key)
