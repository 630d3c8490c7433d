"""Ship the package to executors (spark-submit --py-files equivalent).

Executor Python workers import UDF closures by module reference, so the
package must be on their sys.path regardless of the driver's cwd.  On a
real cluster this is ``spark-submit --py-files lean_explore_spark.zip``
(north_rule); in-process we build the same zip and ``addPyFile`` it,
keyed by content hash so re-adding is a no-op and stale code never
wins.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_ADDED: set[tuple[str, str]] = set()


def build_zip(out_dir: str | None = None) -> str:
    """Zip the package; filename embeds a content hash."""
    pkg_root = Path(__file__).resolve().parent
    entries = sorted(
        p for p in pkg_root.rglob("*.py") if "__pycache__" not in p.parts
    )
    digest = hashlib.md5()
    for p in entries:
        digest.update(str(p.relative_to(pkg_root)).encode())
        digest.update(p.read_bytes())
    tag = digest.hexdigest()[:12]
    out_dir = out_dir or tempfile.gettempdir()
    zip_path = os.path.join(out_dir, f"lean_explore_spark-{tag}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in entries:
                zf.write(p, f"lean_explore_spark/{p.relative_to(pkg_root)}")
        os.replace(tmp, zip_path)
    return zip_path


def ensure_py_files(spark: SparkSession) -> None:
    """Idempotently make the package importable on executors."""
    zip_path = build_zip()
    key = (spark.sparkContext.applicationId, zip_path)
    if key in _ADDED:
        return
    spark.sparkContext.addPyFile(zip_path)
    _ADDED.add(key)
