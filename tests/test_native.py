"""Native (C++) component tests: arena storage + CPU HNSW baseline."""

import numpy as np
import pytest

from embeddinghub_tpu import native


pytestmark = pytest.mark.skipif(
    native.load() is None, reason=f"native build failed: {native.build_error()}"
)


def test_arena_set_get_grow():
    a = native.NativeArena(3, 128)
    rows = np.array([0, 127, 500])
    vecs = np.arange(9, dtype=np.float32).reshape(3, 3)
    a.set(rows, vecs)
    assert a.capacity >= 501
    np.testing.assert_array_equal(a.get(np.array([500])), [[6, 7, 8]])
    data, valid = a.view()
    assert valid.sum() == 3
    assert data.shape[1] == 3


def test_arena_invalidate():
    a = native.NativeArena(2)
    a.set(np.array([1]), np.array([[1.0, 2.0]], np.float32))
    a.invalidate(np.array([1]))
    _, valid = a.view()
    assert valid.sum() == 0


def test_arena_snapshot_roundtrip(tmp_path):
    a = native.NativeArena(4)
    a.set(np.array([3]), np.array([[9, 8, 7, 6]], np.float32))
    path = str(tmp_path / "arena.bin")
    a.save(path)
    b = native.NativeArena.loadfile(path)
    assert b.dims == 4
    np.testing.assert_array_equal(b.get(np.array([3])), [[9, 8, 7, 6]])


def test_cpu_hnsw_exact_small():
    h = native.CpuHnsw(3, m=4, ef_construction=16)
    h.add(np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32))
    d, i = h.search(np.array([[1, 2, 3]], np.float32), k=3, ef=8)
    assert list(i[0]) == [0, 1, 2]
    np.testing.assert_allclose(d[0], [0, 27, 108], atol=1e-3)


def test_cpu_hnsw_recall(rng):
    n, d = 3000, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    h = native.CpuHnsw(d, m=16, ef_construction=100)
    h.add(vecs)
    q = rng.standard_normal((64, d)).astype(np.float32)
    oracle_d = -2 * q @ vecs.T + (vecs * vecs).sum(1)[None, :]
    oracle = np.argsort(oracle_d, axis=1)[:, :10]
    _, ii = h.search(q, 10, ef=100)
    recall = np.mean([len(set(ii[i]) & set(oracle[i])) / 10 for i in range(64)])
    assert recall >= 0.9, recall


def test_cpu_hnsw_empty():
    h = native.CpuHnsw(4)
    d, i = h.search(np.zeros((2, 4), np.float32), k=3)
    assert (i == -1).all()
