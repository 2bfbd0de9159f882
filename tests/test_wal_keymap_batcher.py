"""Targeted unit tests: WAL torn-tail tolerance, keymap row reuse,
query batcher fusion, config parsing."""

import threading
import time

import numpy as np
import pytest

from embeddinghub_tpu.service.batcher import QueryBatcher
from embeddinghub_tpu.store.keymap import KeyMap
from embeddinghub_tpu.store.persistence import VersionWal
from embeddinghub_tpu.utils.config import Config


def test_wal_roundtrip_and_torn_tail(tmp_path):
    path = tmp_path / "wal.bin"
    wal = VersionWal(path)
    wal.append_many(["a", "b"], np.asarray([[1, 2], [3, 4]], np.float32))
    wal.append_delete("a")
    wal.append_freeze()
    wal.close()
    # tear the tail: append garbage byte then half a record
    with open(path, "ab") as f:
        f.write(b"\x01\x05\x00")  # set-tag with truncated key length
    recs = list(VersionWal.replay(path))
    kinds = [r[0] for r in recs]
    assert kinds == ["set", "set", "delete", "freeze"]
    np.testing.assert_array_equal(recs[1][2], [3, 4])


def test_wal_empty_and_missing(tmp_path):
    assert list(VersionWal.replay(tmp_path / "nope.bin")) == []
    wal = VersionWal(tmp_path / "w.bin")
    wal.close()
    assert list(VersionWal.replay(tmp_path / "w.bin")) == []


def test_keymap_row_reuse():
    km = KeyMap()
    a = km.assign("a")
    b = km.assign("b")
    assert km.assign("a") == a  # stable
    km.release("a")
    c = km.assign("c")
    assert c == a  # freed row recycled
    assert km.key(b) == "b" and km.row("c") == c
    assert "a" not in km and len(km) == 2


def test_keymap_state_roundtrip():
    km = KeyMap()
    km.assign("x")
    km.assign("y")
    km.release("x")
    km2 = KeyMap.from_state(km.to_state())
    assert km2.row("y") == km.row("y")
    assert km2.assign("z") == km.assign("z")


class _FakeVersion:
    """Counts batched executions to prove fusion."""

    def __init__(self):
        self.calls = []

    def nearest_batch(self, queries, k):
        self.calls.append(len(queries))
        time.sleep(0.01)
        return [[f"r{i}"] * k for i in range(len(queries))]


def test_batcher_fuses_concurrent_queries():
    version = _FakeVersion()
    batcher = QueryBatcher(window_ms=30, max_batch=64)
    futures = [
        batcher.submit(version, np.zeros(4, np.float32), 2) for _ in range(10)
    ]
    results = [f.result(timeout=5) for f in futures]
    batcher.stop()
    assert all(len(r) == 2 for r in results)
    # 10 concurrent submissions must NOT become 10 singleton executions
    assert len(version.calls) < 10
    assert sum(version.calls) == 10


def test_batcher_propagates_errors():
    class Exploding:
        def nearest_batch(self, queries, k):
            raise RuntimeError("boom")

    batcher = QueryBatcher(window_ms=1, max_batch=8)
    fut = batcher.submit(Exploding(), np.zeros(2, np.float32), 1)
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)
    batcher.stop()


def test_config_env_parsing(monkeypatch):
    monkeypatch.setenv("EMBEDDINGHUB_PORT", "9999")
    monkeypatch.setenv("EMBEDDINGHUB_ENGINE", "hnsw")
    monkeypatch.setenv("EMBEDDINGHUB_METRIC", "cosine")
    cfg = Config.from_env()
    assert cfg.port == 9999
    assert cfg.engine == "hnsw"
    assert cfg.default_metric == "cosine"


def test_wal_torn_tail_inside_vector_bytes(tmp_path):
    """Truncation landing inside a set record's float payload must stop
    replay cleanly, not raise (ADVICE r1: np.frombuffer ValueError)."""
    p = tmp_path / "wal.bin"
    w = VersionWal(p)
    w.append_many(["alpha", "beta"], np.arange(16, dtype=np.float32).reshape(2, 8))
    w.close()
    data = p.read_bytes()
    # cut inside the SECOND record's vector bytes (keep first intact)
    rec = 1 + 4 + 5 + 4 + 32  # tag, klen, "alpha", dims, 8 floats
    p.write_bytes(data[: rec + 20])
    recs = list(VersionWal.replay(p))
    assert len(recs) == 1 and recs[0][1] == "alpha"
    # cut inside the second record's KEY bytes
    p.write_bytes(data[: rec + 3])
    recs = list(VersionWal.replay(p))
    assert len(recs) == 1


def test_wal_fsync_mode(tmp_path):
    w = VersionWal(tmp_path / "wal.bin", fsync=True)
    w.append_many(["k"], np.ones((1, 4), np.float32))
    w.append_delete("k")
    w.append_freeze()
    w.close()
    recs = list(VersionWal.replay(tmp_path / "wal.bin"))
    assert [r[0] for r in recs] == ["set", "delete", "freeze"]
