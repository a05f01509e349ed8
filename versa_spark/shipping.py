"""Ship the versa_spark package to Spark executors.

In production the job runs via ``spark-submit --py-files versa_spark.zip``
(BASELINE.md deployment target).  For interactive/driver-built sessions,
``ensure_shipped(spark)`` zips the installed package once and registers it
with ``addPyFile`` so closures that reference versa_spark modules unpickle
on the workers.  No-op when workers can already import the package (e.g.
same-machine local mode with PYTHONPATH set, or --py-files supplied).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_APPS: set[str] = set()


def package_zip(dest_dir: str | None = None) -> str:
    """Build versa_spark.zip suitable for spark-submit --py-files."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    dest_dir = dest_dir or tempfile.gettempdir()
    zpath = os.path.join(dest_dir, "versa_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join("versa_spark",
                                   os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    return zpath


def ensure_shipped(spark) -> None:
    """Idempotently make versa_spark importable on executors."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    _SHIPPED_APPS.add(app_id)
    spark.sparkContext.addPyFile(package_zip())
