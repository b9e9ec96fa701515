"""Ship the package to executors programmatically.

Python workers import ``pdf_craft_spark`` by name inside every Arrow
kernel; when the driver wasn't launched from the repo root (or without
``spark-submit --py-files``), the workers can't resolve it.  This helper
zips the package once per process and registers it on the SparkContext —
idempotent, called by every API that spawns a Python kernel.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_pdf_craft_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", f"pdf_craft_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "pdf_craft_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._pdf_craft_spark_shipped = True
