"""Ship the package to Spark python workers automatically.

Arrow kernels are closures that workers unpickle by module reference,
so ``chimp_spark`` must be importable in every worker process. When
the driver runs from the repo (or used spark-submit --py-files) that
is already true; when a caller imports the library from an arbitrary
cwd with their own SparkSession, it is not. Every DataFrame-producing
entry point calls :func:`ensure` — it zips the installed package once
(content-hashed, cached in tmp) and ``addPyFile``s it, which works for
any master and also mid-session.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    files = []
    for dirpath, _dirs, names in os.walk(pkg_dir):
        if "__pycache__" in dirpath:
            continue
        for f in sorted(names):
            if f.endswith(".py"):
                files.append(os.path.join(dirpath, f))
    h = hashlib.sha256()
    root = os.path.dirname(pkg_dir)
    for f in sorted(files):
        # the PATH is part of the identity: renaming a module with
        # unchanged contents must invalidate the cached zip, or the
        # stale layout ships and workers ModuleNotFoundError
        h.update(os.path.relpath(f, root).encode() + b"\x00")
        with open(f, "rb") as fh:
            h.update(fh.read())
    out = os.path.join(tempfile.gettempdir(), f"chimp_spark_pkg_{h.hexdigest()[:16]}.zip")
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for f in sorted(files):
                z.write(f, os.path.relpath(f, root))
        os.replace(tmp, out)
    return out


def ensure(spark) -> None:
    """Make chimp_spark importable in this session's python workers."""
    try:
        sc = spark.sparkContext
    except Exception:
        return
    # key by applicationId, NOT id(sc): after spark.stop() a new
    # context's wrapper can reuse the freed object address, and the
    # stale id would skip addPyFile for the new context — the exact
    # ModuleNotFoundError this module exists to prevent
    try:
        key = sc.applicationId
    except Exception:
        key = str(id(sc))
    if key in _SHIPPED:
        return
    try:
        sc.addPyFile(_package_zip())
    except Exception:
        pass  # e.g. connect-only sessions; PYTHONPATH inheritance may still work
    _SHIPPED.add(key)
