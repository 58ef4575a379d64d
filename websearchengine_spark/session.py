"""SparkSession factory with the engine's standard local-mode config.

Also ships the package to executors (``addPyFile`` of a zip — the
programmatic equivalent of ``spark-submit --py-files``), so UDFs that
close over package functions resolve on workers regardless of the
driver's cwd/sys.path.  ``make_pyfiles_zip`` is reused by bench/ for the
real ``spark-submit --py-files`` invocation.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the websearchengine_spark package for --py-files shipping."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), "websearchengine_spark.zip")
    # write-then-rename: the zip sits on the worker PYTHONPATH (fastdaemon
    # wiring below), so a concurrent get_spark in another process must
    # never expose a half-written archive to a launching daemon
    tmp_path = f"{out_path}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        "websearchengine_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    os.replace(tmp_path, out_path)
    return out_path


def get_spark(
    app_name: str = "websearchengine_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``: int N -> ``local[N]``; "*" or None -> ``local[*]``.
    Shuffle partitions default to the core count (local mode; the 200
    default over-parallelizes small data and under-parallelizes big).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_cores = os.cpu_count() if cores in ("*", None) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n_cores)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing targets BYTES, but the engine's Python stages
        # (posting encode, WAND kernels) cost per ROW/GROUP: a few MB of
        # packed postings coalesced to 2-3 tasks serializes the encode on
        # 2-3 cores.  A small floor keeps parallelismFirst coalescing up
        # at the core count for small shuffles; at real data volumes
        # (bytes/core >> 1 MB) this knob is inert, so it is not a
        # local-only tuning.  Env-overridable for cluster profiles.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    # Python-worker daemon with the CPython-3.12 zipimport stat gate
    # (fastdaemon.py): pyspark.worker invalidates import caches once per
    # task, and on <=3.11 that re-parses every sys.path archive's central
    # directory — measured ~130 ms per task before any UDF body runs, the
    # dominant fixed cost of every Python stage.  The package zip rides
    # the worker PYTHONPATH so the daemon module resolves before the
    # first task ships it via addPyFile.  Local masters only by default:
    # on a cluster the driver-local zip path does not exist on executors
    # (ship it and set SPARK_GRAFT_FASTDAEMON=1 to enable there).
    _fd = os.environ.get("SPARK_GRAFT_FASTDAEMON", "")
    if _fd != "0" and os.name == "posix" and (
        master.startswith("local") or _fd == "1"
    ):
        try:
            _pyzip = make_pyfiles_zip()
        except OSError:
            _pyzip = None  # unwritable tmp: run the stock daemon instead
        if _pyzip is not None:
            b = b.config(
                "spark.python.daemon.module", "websearchengine_spark.fastdaemon"
            ).config("spark.executorEnv.PYTHONPATH", _pyzip)
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        spark.sparkContext.addPyFile(make_pyfiles_zip())
    except Exception:
        pass  # already added in this context
    return spark
