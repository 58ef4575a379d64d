"""Python-worker daemon wrapper: ``pyspark.daemon`` plus a backport of
CPython 3.12's stat-gated ``zipimporter.invalidate_caches``.

Why this exists (guide §4 — the Python boundary): ``pyspark.worker``
calls ``importlib.invalidate_caches()`` ONCE PER TASK
(``worker_util.setup_spark_files`` — it is how a late ``addPyFile``
becomes importable mid-application).  On Python <= 3.11,
``zipimport.zipimporter.invalidate_caches`` re-reads the archive's whole
central directory UNCONDITIONALLY (CPython added the stat gate in 3.12),
and a Spark worker's sys.path carries several large archives —
pyspark.zip (~3.5 MB), the spark-core jar (~15 MB, ~20k entries), py4j,
plus every ``--py-files`` zip — each holding one cached zipimporter PER
PACKAGE PREFIX ever scanned.  Measured on the bench host: **~130 ms of
central-directory re-parsing per task, before the UDF body even
starts** — the dominant fixed cost of every Python stage (mapInPandas /
mapInArrow / applyInArrow kernels), on a cluster just as in local mode.

The backport keeps the exact visibility contract: an archive whose
mtime or size changed is re-read (late file updates are still picked
up); an unchanged archive keeps its cached directory.  Python >= 3.12
already behaves this way, so the patch is skipped there.

Activated via ``spark.python.daemon.module=websearchengine_spark.
fastdaemon`` with the package zip on the worker PYTHONPATH
(session.get_spark wires both for local masters; disable with
SPARK_GRAFT_FASTDAEMON=0, force-enable on a cluster with =1 after
shipping the zip to a path that exists on every executor).  The patch
runs in the daemon parent process before any fork, so every worker
inherits it.
"""

from __future__ import annotations

import os
import sys
import zipimport


def install_zipimport_stat_gate() -> bool:
    """Monkey-patch ``zipimporter.invalidate_caches`` with the 3.12
    stat gate.  Returns True when installed, False when the running
    Python already has the gate natively (>= 3.12)."""
    if sys.version_info >= (3, 12):
        return False
    orig = zipimport.zipimporter.invalidate_caches

    def invalidate_caches(self):
        try:
            st = os.stat(self.archive)
            key = (st.st_mtime_ns, st.st_size)
        except OSError:
            key = None
        if key is not None and getattr(self, "_wse_zip_stat", None) == key:
            return  # archive unchanged: keep the cached directory
        orig(self)
        if key is not None:
            self._wse_zip_stat = key

    zipimport.zipimporter.invalidate_caches = invalidate_caches
    return True


if __name__ == "__main__":
    try:
        install_zipimport_stat_gate()
    except Exception:  # pragma: no cover - never break worker startup
        pass
    from pyspark.daemon import manager

    manager()
