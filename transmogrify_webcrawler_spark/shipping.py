"""Ship this package to executor Python workers (the spark-submit --py-files
story, BASELINE.json north_rule). In local mode workers usually inherit the
driver's sys.path, but any driver started outside the repo root — or a real
multi-executor cluster — needs the package distributed. ``ship_package`` zips
the package once per SparkContext and registers it with addPyFile; idempotent.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_FLAG = "_transmogrify_webcrawler_spark_shipped"


def package_zip(dest_dir: str | None = None) -> str:
    """Create engine.zip containing the package (for --py-files)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest = os.path.join(dest_dir or tempfile.gettempdir(),
                        "transmogrify_webcrawler_spark.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return dest


def ship_package(spark) -> None:
    """Idempotently register the package zip with the SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_FLAG, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _SHIPPED_FLAG, True)
