"""Ship the package to executors programmatically.

Python workers import ``pdf_craft_spark`` by name inside every Arrow
kernel; when the driver wasn't launched from the repo root (or without
``spark-submit --py-files``), the workers can't resolve it.  This helper
zips the package once per process and registers it on the SparkContext —
idempotent, called by every API that spawns a Python kernel.

The zip is keyed by a CONTENT FINGERPRINT of the package sources, not by
PID: in a long-lived container PIDs recycle, and a pid-keyed cache once
re-shipped a STALE zip from an earlier build — workers silently ran old
kernel code and produced a different span count (observed: 1109 vs 2833
entry() rows).  Content-keyed, a source edit always produces a new zip
name and an unchanged source reuses the old one safely.  The zip is
written to a temp name and renamed so a concurrent process can never
read a half-written archive.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession


def _pkg_fingerprint(pkg_dir: str) -> str:
    h = hashlib.md5()
    for root, dirs, files in os.walk(pkg_dir):
        dirs.sort()
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            full = os.path.join(root, fname)
            h.update(os.path.relpath(full, pkg_dir).encode())
            with open(full, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_pdf_craft_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        "/tmp", f"pdf_craft_spark_pkg_{_pkg_fingerprint(pkg_dir)}.zip"
    )
    if not os.path.exists(zip_path):
        tmp_path = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp_path, "w") as zf:
            for root, dirs, files in os.walk(pkg_dir):
                dirs.sort()
                for fname in sorted(files):
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "pdf_craft_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp_path, zip_path)
    sc.addPyFile(zip_path)
    sc._pdf_craft_spark_shipped = True
