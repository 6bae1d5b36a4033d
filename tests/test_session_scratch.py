"""The spark.local.dir scratch resolver (session._scratch_local_dir).

Pure-python: the conf itself is static (JVM-start-time), so the shared test
session can't exercise it end-to-end — these pin the resolution contract the
bench/driver sessions rely on (round-14: shuffle-file creation latency on the
default tempdir measured 27x the RAM fs on the bench host; guide §6).
"""

import os

from flink_notebooks_spark.session import _scratch_local_dir


def test_env_knob_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    d = _scratch_local_dir()
    assert d is not None and d.startswith(str(tmp_path))
    assert os.path.isdir(d)


def test_env_knob_bypasses_free_space_floor(tmp_path, monkeypatch):
    # an explicit operator choice is honored even where the default would
    # have declined (e.g. a deliberately small scratch volume)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    d = _scratch_local_dir(min_free_bytes=1 << 60)
    assert d is not None and d.startswith(str(tmp_path))


def test_default_declines_when_free_space_insufficient(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    assert _scratch_local_dir(min_free_bytes=1 << 60) is None


def test_default_resolves_to_writable_dir(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    d = _scratch_local_dir(min_free_bytes=1)
    if d is None:  # no writable /dev/shm on this host — Spark default stands
        assert not os.access("/dev/shm", os.W_OK)
    else:
        assert d.startswith("/dev/shm/") and os.access(d, os.W_OK)
