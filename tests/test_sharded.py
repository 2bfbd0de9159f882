"""Sharded (multi-chip) index tests on the 8-device virtual CPU mesh.

Validates the SPMD search path: per-shard fused top-k + all_gather merge
must return exactly the same results as the single-chip FlatIndex.
"""

import jax
import numpy as np
import pytest

from embeddinghub_tpu.index import FlatIndex
from embeddinghub_tpu.parallel import ShardedFlatIndex, default_mesh


@pytest.fixture(scope="module")
def mesh():
    return default_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_sharded_matches_single_chip(rng, mesh, metric):
    n, d, b, k = 5000, 32, 17, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)

    flat = FlatIndex(d, metric=metric)
    flat.add(np.arange(n), vecs)
    sharded = ShardedFlatIndex(d, metric=metric, mesh=mesh)
    sharded.add(np.arange(n), vecs)

    fd, fi = flat.search(q, k)
    sd, si = sharded.search(q, k)
    np.testing.assert_allclose(sd, fd, rtol=1e-3, atol=1e-3)
    # same rows modulo fp ties: check distance of chosen rows agree
    assert (np.sort(si, axis=1) != np.sort(fi, axis=1)).mean() < 0.05


def test_sharded_exactness_perturbed(rng, mesh):
    n, d = 2000, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedFlatIndex(d, mesh=mesh)
    idx.add(np.arange(n), vecs)
    q = vecs[::100] + 0.001
    _, rows = idx.search(q, 1)
    np.testing.assert_array_equal(rows[:, 0], np.arange(0, n, 100))


def test_sharded_incremental_insert(rng, mesh):
    d = 8
    idx = ShardedFlatIndex(d, mesh=mesh)
    a = rng.standard_normal((100, d)).astype(np.float32)
    idx.add(np.arange(100), a)
    idx.search(a[:1], 1)  # sync once
    b = rng.standard_normal((300, d)).astype(np.float32)
    idx.add(np.arange(100, 400), b)  # forces growth + resync
    assert idx.size == 400
    _, rows = idx.search(b[5:6], 1)
    assert rows[0, 0] == 105


def test_sharded_remove(rng, mesh):
    d = 8
    vecs = rng.standard_normal((50, d)).astype(np.float32)
    idx = ShardedFlatIndex(d, mesh=mesh)
    idx.add(np.arange(50), vecs)
    idx.remove([7])
    _, rows = idx.search(vecs[7:8], 50)
    assert 7 not in rows[0]


def test_sharded_empty(mesh):
    idx = ShardedFlatIndex(4, mesh=mesh)
    d, i = idx.search(np.zeros((3, 4), np.float32), 5)
    assert (i == -1).all()


def test_sharded_k_exceeds_live(rng, mesh):
    d = 8
    vecs = rng.standard_normal((3, d)).astype(np.float32)
    idx = ShardedFlatIndex(d, mesh=mesh)
    idx.add(np.arange(3), vecs)
    dist, rows = idx.search(vecs[:1], 8)
    assert np.isfinite(dist[0, :3]).all()
    assert (rows[0, 3:] == -1).all()


def test_sharded_streaming_scatter_path(rng, mesh):
    """Small post-sync inserts take the scatter path, not a re-upload."""
    d = 8
    idx = ShardedFlatIndex(d, mesh=mesh, capacity=2048)
    vecs = rng.standard_normal((500, d)).astype(np.float32)
    idx.add(np.arange(500), vecs)
    idx.search(vecs[:1], 1)  # full sync
    new = rng.standard_normal((20, d)).astype(np.float32)
    idx.add(np.arange(500, 520), new)  # within capacity
    assert not idx._dirty and len(idx._dirty_rows) == 20
    _, rows = idx.search(new[3:4], 1)
    assert rows[0, 0] == 503
    assert len(idx._dirty_rows) == 0
    # updates to existing rows also stream
    moved = vecs[7] + 100.0
    idx.add([7], moved[None, :])
    _, rows = idx.search(moved[None, :], 1)
    assert rows[0, 0] == 7


def test_sharded_hnsw_recall_and_roundtrip(rng, mesh):
    """Graph engine over the mesh: per-shard greedy-descent + beam in one
    shard_map dispatch, ICI all_gather merge.  Union of per-shard top-k
    must recover the true global top-k at beam ef >= local shard size
    class; snapshot/restore preserves results."""
    from embeddinghub_tpu.parallel.sharded_hnsw import ShardedHNSWIndex

    n, d, k = 4096, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    idx = ShardedHNSWIndex(d, mesh=mesh, m=8, ef_construction=48,
                           capacity=n)
    idx.add(np.arange(n), vecs)
    assert idx.size == n

    d2 = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    oracle = np.argsort(d2, axis=1)[:, :k]
    _, got = idx.search(q, k, ef=64)
    rec = np.mean(
        [len(set(got[i]) & set(oracle[i])) / k for i in range(len(q))]
    )
    assert rec >= 0.9, rec

    # keyed self-retrieval across shards
    rows = rng.choice(n, 32, replace=False)
    _, i1 = idx.search(vecs[rows] + 1e-5, 1, ef=48)
    assert (i1[:, 0] == rows).mean() >= 0.95

    # removal masks rows out of results
    idx.remove(rows[:4])
    _, i2 = idx.search(vecs[rows[:4]] + 1e-5, 1, ef=48)
    assert not np.isin(i2[:, 0], rows[:4]).any()

    # snapshot -> restore -> identical top-1
    arrays = idx.state_arrays()
    idx2 = ShardedHNSWIndex.from_state(d, "l2", arrays, mesh=mesh)
    _, j1 = idx.search(q, k, ef=64)
    _, j2 = idx2.search(q, k, ef=64)
    assert (j1[:, 0] == j2[:, 0]).all()


def test_sharded_hnsw_empty_and_streaming(rng, mesh):
    from embeddinghub_tpu.parallel.sharded_hnsw import ShardedHNSWIndex

    d = 16
    idx = ShardedHNSWIndex(d, mesh=mesh, m=8, ef_construction=32)
    dist, ids = idx.search(np.zeros((5, d), np.float32), 3)
    assert ids.shape == (5, 3) and (ids == -1).all()
    # streaming adds in batches, including shard-uneven tails
    x = rng.standard_normal((700, d)).astype(np.float32)
    for s in range(0, 700, 150):
        idx.add(np.arange(s, min(s + 150, 700)), x[s:min(s + 150, 700)])
    _, got = idx.search(x[:8] + 1e-5, 1, ef=32)
    assert (got[:, 0] == np.arange(8)).all()


def test_sharded_int8_matches_f32_ranking(rng, mesh):
    """int8 sharded arenas (4x rows/chip) keep ranking within rerank
    tolerance of the f32 mesh scan."""
    n, d, k = 4096, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((13, d)).astype(np.float32)
    f32 = ShardedFlatIndex(d, mesh=mesh, capacity=n)
    f32.add(np.arange(n), vecs)
    q8 = ShardedFlatIndex(d, mesh=mesh, capacity=n, storage_dtype="int8")
    q8.add(np.arange(n), vecs)
    _, want = f32.search(q, k)
    _, got = q8.search(q, k)
    overlap = np.mean([
        len(set(got[i]) & set(want[i])) / k for i in range(len(q))
    ])
    assert overlap >= 0.9, overlap
    # streaming scatter path (in-place overwrite after sync) keeps the
    # quantized arena coherent
    nv = 3.0 + rng.standard_normal((16, d)).astype(np.float32)
    q8.add(np.arange(16), nv)
    assert not q8._dirty  # small dirty set -> scatter, not full re-upload
    _, i = q8.search(nv[:4] + 1e-5, 1)
    assert not q8._dirty_rows  # the sync drained via the scatter path
    assert (i[:, 0] == np.arange(4)).all()


def test_sharded_int8x2_residual_rerank(rng, mesh):
    """int8x2 on the mesh: the residual plane resolves near-duplicate
    clusters whose score gaps sit below int8 noise (single-chip analog:
    tests/test_flat_index.py)."""
    d, per, n_c = 32, 200, 10
    centers = 3.0 * rng.standard_normal((n_c, d)).astype(np.float32)
    x = np.repeat(centers, per, axis=0) + 0.2 * rng.standard_normal(
        (n_c * per, d)
    ).astype(np.float32)
    n = len(x)
    q = centers[np.arange(16) % n_c] + 0.2 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ xn.T), axis=1)[:, :10]

    def recall(storage):
        idx = ShardedFlatIndex(
            d, metric="cosine", mesh=mesh, capacity=n,
            storage_dtype=storage,
        )
        idx.add(np.arange(n), x)
        _, got = idx.search(q, 10)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / 10 for i in range(len(q))]
        )

    r8 = recall("int8")
    r8x2 = recall("int8x2")
    assert r8x2 >= 0.9, (r8, r8x2)
    assert r8x2 >= r8, (r8, r8x2)
    # snapshot keeps the dtype
    idx = ShardedFlatIndex(d, mesh=mesh, capacity=n,
                           storage_dtype="int8x2")
    idx.add(np.arange(256), rng.standard_normal((256, d)).astype(np.float32))
    arrays = idx.state_arrays()
    idx2 = ShardedFlatIndex.from_state(d, "l2", arrays, mesh=mesh)
    assert idx2.storage_dtype == "int8x2"
