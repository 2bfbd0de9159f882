"""FlatIndex behavior tests.

Mirrors reference ``index_test.cc`` semantics: exactness on tiny vector
sets, update-in-place on re-add of the same row, k=0, capacity growth.
"""

import numpy as np

from embeddinghub_tpu.index import FlatIndex


def test_exact_small_vectors():
    idx = FlatIndex(dims=3)
    idx.add(np.arange(3), np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32))
    d, i = idx.search(np.array([[1, 2, 3]], np.float32), k=3)
    assert list(i[0]) == [0, 1, 2]
    np.testing.assert_allclose(d[0], [0.0, 27.0, 108.0], atol=1e-3)


def test_update_same_row_replaces():
    idx = FlatIndex(dims=2)
    idx.add([0], [[0.0, 0.0]])
    idx.add([1], [[10.0, 10.0]])
    # move row 0 far away; nearest to origin becomes row 1
    idx.add([0], [[100.0, 100.0]])
    assert idx.size == 2
    _, i = idx.search(np.array([[9.0, 9.0]], np.float32), k=1)
    assert i[0, 0] == 1


def test_k_zero():
    idx = FlatIndex(dims=2)
    idx.add([0], [[1.0, 1.0]])
    d, i = idx.search(np.array([[0.0, 0.0]], np.float32), k=0)
    assert d.shape == (1, 0) and i.shape == (1, 0)


def test_empty_index_search():
    idx = FlatIndex(dims=4)
    d, i = idx.search(np.zeros((2, 4), np.float32), k=3)
    assert (i == -1).all() and np.isinf(d).all()


def test_capacity_doubling(rng):
    idx = FlatIndex(dims=8, capacity=128)
    n = 1000
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    idx.add(np.arange(n), vecs)
    assert idx.capacity >= n and idx.size == n
    q = vecs[123:124]
    _, i = idx.search(q, k=1)
    assert i[0, 0] == 123


def test_remove(rng):
    idx = FlatIndex(dims=4)
    vecs = rng.standard_normal((10, 4)).astype(np.float32)
    idx.add(np.arange(10), vecs)
    idx.remove([3])
    assert idx.size == 9
    _, i = idx.search(vecs[3:4], k=10)
    assert 3 not in i[0]


def test_incremental_add_after_search(rng):
    """Dirty-row scatter path: search, add more, search again."""
    idx = FlatIndex(dims=4)
    vecs = rng.standard_normal((20, 4)).astype(np.float32)
    idx.add(np.arange(10), vecs[:10])
    idx.search(vecs[:1], k=1)  # force device sync
    idx.add(np.arange(10, 20), vecs[10:])  # scatter path
    _, i = idx.search(vecs[15:16], k=1)
    assert i[0, 0] == 15


def test_cosine_metric(rng):
    idx = FlatIndex(dims=8, metric="cosine")
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    idx.add(np.arange(50), vecs)
    q = vecs[7:8] * 3.0  # scaled copy: cosine distance 0 to row 7
    d, i = idx.search(q, k=1)
    assert i[0, 0] == 7
    assert d[0, 0] < 1e-4


def test_snapshot_roundtrip(rng):
    idx = FlatIndex(dims=4)
    vecs = rng.standard_normal((10, 4)).astype(np.float32)
    idx.add(np.arange(10), vecs)
    idx.remove([2])
    state = idx.state_arrays()
    idx2 = FlatIndex.from_state(4, "l2", state)
    assert idx2.size == 9
    _, i = idx2.search(vecs[5:6], k=1)
    assert i[0, 0] == 5


def test_bf16_storage(rng):
    idx = FlatIndex(dims=16, storage_dtype="bfloat16")
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    idx.add(np.arange(300), vecs)
    _, i = idx.search(vecs[42:43], k=1)
    assert i[0, 0] == 42
    # incremental scatter keeps the bf16 dtype
    idx.add(np.arange(300, 320), rng.standard_normal((20, 16)).astype(np.float32))
    _, i = idx.search(idx.vector(310)[None, :], k=1)
    assert i[0, 0] == 310
    assert str(idx._dx.dtype) == "bfloat16"


def test_int8_storage(rng):
    idx = FlatIndex(dims=32, storage_dtype="int8", capacity=4096)
    vecs = rng.standard_normal((2000, 32)).astype(np.float32)
    idx.add(np.arange(2000), vecs)
    # perturbed copies must come back top-1
    q = vecs[100:110] + 0.001
    _, i = idx.search(q, k=1)
    np.testing.assert_array_equal(i[:, 0], np.arange(100, 110))
    # recall vs oracle stays high despite quantization
    qs = rng.standard_normal((64, 32)).astype(np.float32)
    d = -2 * qs @ vecs.T + (vecs * vecs).sum(1)[None, :]
    oracle = np.argsort(d, axis=1)[:, :10]
    _, got = idx.search(qs, 10)
    recall = np.mean([len(set(got[i]) & set(oracle[i])) / 10 for i in range(64)])
    assert recall >= 0.95, recall
    # incremental scatter path
    idx.search(qs[:1], 1)
    idx.add([2000], (vecs[0] * 2 + 5)[None, :])
    _, i = idx.search((vecs[0] * 2 + 5)[None, :], 1)
    assert i[0, 0] == 2000


def test_int8x2_residual_storage(rng):
    """int8x2 (hi + residual lo) resolves dense near-duplicate clusters
    whose within-cluster score gaps sit below plain-int8 noise."""
    dims, per, n_c = 32, 200, 10
    centers = 3.0 * rng.standard_normal((n_c, dims)).astype(np.float32)
    x = np.repeat(centers, per, axis=0) + 0.2 * rng.standard_normal(
        (n_c * per, dims)
    ).astype(np.float32)
    n = len(x)
    q = centers[np.arange(16) % n_c] + 0.2 * rng.standard_normal(
        (16, dims)
    ).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ xn.T), axis=1)[:, :10]

    def recall(storage):
        idx = FlatIndex(dims=dims, metric="cosine", storage_dtype=storage,
                        capacity=n)
        idx.add(np.arange(n), x)
        _, got = idx.search(q, 10)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / 10 for i in range(len(q))]
        )

    r1 = recall("int8")
    r2 = recall("int8x2")
    assert r2 >= 0.95, (r1, r2)
    assert r2 > r1, (r1, r2)  # the residual rerank is what fixes it
    # scatter path keeps hi+lo coherent
    idx = FlatIndex(dims=dims, metric="cosine", storage_dtype="int8x2",
                    capacity=n + 8)
    idx.add(np.arange(n), x)
    idx.search(q[:1], 1)
    nv = centers[0] + 0.2 * rng.standard_normal(dims).astype(np.float32)
    idx.add([n], nv[None, :])
    _, i = idx.search(nv[None, :], 1)
    assert i[0, 0] == n


def test_search_async_pipelined(rng):
    """search_async returns device handles matching the sync results;
    pipelined dispatch (issue all, then drain) is the wire-bound serving
    pattern (bench.py)."""
    x = rng.standard_normal((5000, 16)).astype(np.float32)
    idx = FlatIndex(dims=16, capacity=5000)
    idx.add(np.arange(5000), x)
    qs = [x[i * 7 : i * 7 + 13] + 1e-4 for i in range(3)]
    handles = [idx.search_async(q, 4, query_dtype=None) for q in qs]
    for q, h in zip(qs, handles):
        got = np.asarray(h)
        _, want = idx.search(q, 4)
        assert got.shape == (13, 4)
        assert (got[:, 0] == want[:, 0]).all()
    # empty-index path returns -1s without dispatching
    empty = FlatIndex(dims=16)
    h = empty.search_async(np.zeros((5, 16), np.float32), 3)
    assert (np.asarray(h) == -1).all()


def test_search_async_quantized_storage(rng):
    """Regression (r2 review): search_async on int8/int8x2 arenas must
    route through the quantized kernels — feeding the raw int8 plane to
    the f32 scorers ranked garbage (recall 0.26 vs 1.0)."""
    n, d = 4096, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ xn.T), axis=1)[:, :10]
    for storage in ("int8", "int8x2"):
        idx = FlatIndex(dims=d, metric="cosine", storage_dtype=storage,
                        capacity=n)
        idx.add(np.arange(n), x)
        got = np.asarray(idx.search_async(q, 10))
        rec = np.mean(
            [len(set(got[i]) & set(oracle[i])) / 10 for i in range(len(q))]
        )
        assert rec >= 0.95, (storage, rec)


def test_int8_query_upload(rng):
    """query_dtype="int8" (quarter upload bytes: per-query scale,
    device-side dequant) keeps recall@10 within noise of full-precision
    queries on both the f32 and int8-storage scoring paths."""
    n, d = 4096, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((64, d)).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ xn.T), axis=1)[:, :10]

    def recall(storage, qdtype):
        idx = FlatIndex(dims=d, metric="cosine", storage_dtype=storage,
                        capacity=n)
        idx.add(np.arange(n), x)
        _, got = idx.search(q, 10, query_dtype=qdtype)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / 10 for i in range(len(q))]
        )

    assert recall("float32", "int8") >= 0.97
    assert recall("int8", "int8") >= 0.95
    # async path accepts it too and agrees with the sync result
    idx = FlatIndex(dims=d, metric="cosine", capacity=n)
    idx.add(np.arange(n), x)
    h = idx.search_async(q[:13], 4, query_dtype="int8")
    got = np.asarray(h)
    _, want = idx.search(q[:13], 4, query_dtype="int8")
    assert got.shape == (13, 4)
    assert (got == want[:, :4]).all()


def test_deep_capacity_non_pow2(rng):
    """Past 2M rows capacity rounds to 1M-row blocks, not pow2 (pow2
    padding at 50M wastes 17.1M phantom rows ~= 2.1 GB of int8x2 arena
    — the r4 50M OOM, benchmarks/artifacts/r4_cap50m.log), and the
    deep chunked search must accept the non-pow2 capacity (its scan
    chunk is capped at the rounding block so cap % chunk == 0)."""
    from embeddinghub_tpu.index.flat import _round_capacity

    blk = 1 << 20
    assert _round_capacity(128) == 128
    assert _round_capacity(2_000_000) == 1 << 21        # pow2 regime
    assert _round_capacity(2_500_000) == 3 * blk        # block regime
    assert _round_capacity(50_000_000) == 48 * blk
    assert _round_capacity(48 * blk) == 48 * blk        # idempotent

    n_hot = 2048
    d = 8
    idx = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                    capacity=2_500_000, quant_guard=False)
    assert idx.capacity == 3 * blk
    x = rng.standard_normal((n_hot, d)).astype(np.float32)
    # scatter rows across the deep arena, incl. past the 2M pow2 mark
    rows = np.linspace(0, 2_400_000, n_hot).astype(np.int64)
    idx.add(rows, x)
    q = x[:16] + 1e-4 * rng.standard_normal((16, d)).astype(np.float32)
    _, got = idx.search(q, 5)
    assert (got[:, 0] == rows[:16]).all()
    got_async = np.asarray(idx.search_async(q, 5))
    assert (got_async[:, 0] == rows[:16]).all()


def test_packed_id_readback(rng, monkeypatch):
    """ops/bitpack wire compression: forced-on (CPU mesh), the packed
    ids-only readback must be bit-identical to the unpacked path for
    both search(with_distances=False) and search_async, including -1
    sentinels from an underfilled index."""
    from embeddinghub_tpu.ops import bitpack

    # unit roundtrip incl. the -1 sentinel and non-multiple-of-32 n
    ids = rng.integers(-1, 99_999, 4099).astype(np.int32)
    import jax.numpy as jnp

    w = np.asarray(bitpack.pack_ids(jnp.asarray(ids), bits=bitpack.bits_for(99_999)))
    assert w.size * 4 < ids.size * 4 * 0.6          # >1.6x smaller
    back = bitpack.unpack_ids(w, ids.size, bits=bitpack.bits_for(99_999))
    assert (back == ids).all()

    n, d, b, k = 8192, 16, 256, 16                   # b*k >= 2048 gate
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[rng.integers(0, n, b)] + 1e-4
    idx = FlatIndex(dims=d, capacity=n)
    idx.add(np.arange(n), x)
    _, want = idx.search(q, k, with_distances=False)
    monkeypatch.setenv("EHTPU_FORCE_PACK_IDS", "1")
    _, got = idx.search(q, k, with_distances=False)
    assert got.dtype == np.int64 and (got == want).all()
    h = idx.search_async(q, k, query_dtype=None)
    assert h.shape == (b, k)
    assert (np.asarray(h) == want).all()

    # underfilled: -1 sentinels survive the packed wire
    small = FlatIndex(dims=d, capacity=4096)
    small.add(np.arange(4), x[:4])
    _, got2 = small.search(q[:256], 16, with_distances=False)
    assert (got2 == -1).sum() == 256 * 12


def test_deep_region_scatter_crosses_regions(rng):
    """Deep-arena streaming writes go through the regioned plane
    scatter (flat._region_scatter_plane): whole-plane ``.at[].set``
    compiles an arena-sized operand copy that OOMs past ~50M rows
    (r5_cap100m_stream.log).  Rows scattered into BOTH regions of a
    2-region arena must land exactly — including int8x2's lo plane —
    and remain findable by their own vector."""
    from embeddinghub_tpu.index import flat as flat_mod

    d = 16
    cap = flat_mod._SCATTER_REGION_ROWS + (1 << 20)  # 2 regions
    for storage in ("int8", "int8x2"):
        idx = FlatIndex(
            dims=d, metric="cosine", capacity=cap, storage_dtype=storage,
            quant_guard=False,
        )
        base_rows = np.arange(64)
        base = rng.standard_normal((64, d)).astype(np.float32)
        idx.add(base_rows, base)                 # full sync path
        _ = idx.search(base[:4], 1)              # materialize arenas
        stream_rows = np.asarray(
            [7, 1 << 19, flat_mod._SCATTER_REGION_ROWS + 5, cap - 3]
        )
        vecs = rng.standard_normal((4, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        idx.add(stream_rows, vecs)               # dirty-row scatter path
        dists, got = idx.search(vecs, 1)
        assert (got[:, 0] == stream_rows).all(), (got[:, 0], stream_rows)
        assert (dists[:, 0] < 1e-2).all()
