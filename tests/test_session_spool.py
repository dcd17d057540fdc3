"""Spool/scratch root selection: the SPARK_GRAFT_SPOOL_DIR cluster
override (r12, VERDICT r11 item 6) must be honored by every scratch
path the engine derives — on a real cluster executors cannot read the
driver's /dev/shm, so all spooled artifacts must be placeable on a
shared mount via one env var."""

from __future__ import annotations

import os

from pulsar_lunar_spark.session import scratch_root, spool_base_dir


def test_spool_dir_override_honored(tmp_path, monkeypatch):
    custom = str(tmp_path / "shared-mount")
    os.makedirs(custom, exist_ok=True)
    monkeypatch.setenv("SPARK_GRAFT_SPOOL_DIR", custom)
    assert spool_base_dir() == custom
    p = scratch_root("pl_spool_test", "/root/testdata/sf0.001")
    assert p.startswith(custom + os.sep), p
    # per-(kind, dataset, process) layout is preserved under the override
    assert "pl_spool_test" in p and str(os.getpid()) in p


def test_spool_dir_default_is_local_tmpfs(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SPOOL_DIR", raising=False)
    base = spool_base_dir()
    assert base == "/dev/shm" or base == __import__("tempfile").gettempdir()
    assert scratch_root("pl_spool_test2").startswith(base + os.sep)
