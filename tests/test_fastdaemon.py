"""fastdaemon: the CPython-3.12 zipimport stat-gate backport.

The patch must (a) skip the central-directory re-read when the archive
is unchanged — that re-read is the ~130 ms/task worker cost the daemon
wrapper exists to remove — and (b) preserve the visibility contract:
an archive whose mtime/size changed IS re-read, so a late addPyFile
update still becomes importable.
"""

import os
import sys
import zipfile
import zipimport

import pytest

from websearchengine_spark.fastdaemon import install_zipimport_stat_gate


@pytest.fixture()
def patched_zipimport():
    orig = zipimport.zipimporter.invalidate_caches
    installed = install_zipimport_stat_gate()
    try:
        yield installed
    finally:
        zipimport.zipimporter.invalidate_caches = orig


def _write_zip(path: str, content: str) -> None:
    tmp = f"{path}.tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        zf.writestr("wse_fd_probe_mod.py", content)
    os.replace(tmp, path)


def test_unchanged_archive_skips_reread(tmp_path, patched_zipimport):
    if sys.version_info >= (3, 12):
        pytest.skip("3.12+ has the stat gate natively")
    assert patched_zipimport is True
    zp = str(tmp_path / "probe.zip")
    _write_zip(zp, "X = 1\n")
    zi = zipimport.zipimporter(zp)
    assert b"X = 1" in zi.get_data("wse_fd_probe_mod.py")

    # count central-directory reads through the module-global hook the
    # 3.11 pure-python implementation uses
    calls = {"n": 0}
    orig_rd = zipimport._read_directory

    def counting_rd(archive):
        calls["n"] += 1
        return orig_rd(archive)

    zipimport._read_directory = counting_rd
    try:
        zi.invalidate_caches()  # first call records the stat key
        first = calls["n"]
        zi.invalidate_caches()
        zi.invalidate_caches()
        assert calls["n"] == first, "unchanged archive was re-read"
    finally:
        zipimport._read_directory = orig_rd


def test_changed_archive_is_reread_and_visible(tmp_path, patched_zipimport):
    zp = str(tmp_path / "probe.zip")
    _write_zip(zp, "X = 1\n")
    zi = zipimport.zipimporter(zp)
    zi.invalidate_caches()
    assert b"X = 1" in zi.get_data("wse_fd_probe_mod.py")

    _write_zip(zp, "X = 2\n")
    # force a distinct mtime even on coarse-granularity filesystems
    st = os.stat(zp)
    os.utime(zp, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    zi.invalidate_caches()
    assert b"X = 2" in zi.get_data("wse_fd_probe_mod.py")


def test_get_spark_wires_fastdaemon_for_local_master(spark):
    # the shared session fixture goes through get_spark; on a posix local
    # master the daemon module and the package zip PYTHONPATH must be set
    assert (
        spark.conf.get("spark.python.daemon.module")
        == "websearchengine_spark.fastdaemon"
    )
    pyzip = spark.conf.get("spark.executorEnv.PYTHONPATH")
    assert pyzip.endswith("websearchengine_spark.zip") and os.path.exists(pyzip)
