"""Store-layer tests.

Mirrors reference gtest suites ``version_test.cc`` (put/get,
immutability), ``space_test.cc``, ``embedding_store_test.cc`` and the
WAL/snapshot persistence model (reference persisted via RocksDB and
rebuilt indexes from scans, ``version.cc:64-74``).
"""

import json

import numpy as np
import pytest

from embeddinghub_tpu.store import (
    EmbeddingHub,
    ImmutableVersionError,
    InvalidArgumentError,
    KeyNotFoundError,
    DimensionMismatchError,
    Version,
)


def test_version_set_get():
    v = Version("s", "initial", 3)
    v.set("a", [1, 2, 3])
    np.testing.assert_array_equal(v.get("a"), [1, 2, 3])


def test_version_update_overwrites():
    v = Version("s", "initial", 2)
    v.set("a", [1, 1])
    v.set("a", [2, 2])
    np.testing.assert_array_equal(v.get("a"), [2, 2])
    assert v.size == 1


def test_version_immutability():
    v = Version("s", "initial", 2)
    v.set("a", [1, 1])
    v.make_immutable()
    with pytest.raises(ImmutableVersionError):
        v.set("b", [2, 2])
    # reads still work
    np.testing.assert_array_equal(v.get("a"), [1, 1])


def test_version_missing_key():
    v = Version("s", "initial", 2)
    with pytest.raises(KeyNotFoundError):
        v.get("nope")


def test_version_dim_check():
    v = Version("s", "initial", 3)
    with pytest.raises(DimensionMismatchError):
        v.set("a", [1, 2])


def test_nearest_keyed_excludes_self():
    v = Version("s", "initial", 2)
    v.multiset([("a", [0, 0]), ("b", [1, 0]), ("c", [5, 5])])
    assert v.nearest(1, key="a") == ["b"]
    assert v.nearest(2, key="a") == ["b", "c"]


def test_nearest_by_vector_can_return_exact_match():
    v = Version("s", "initial", 2)
    v.multiset([("a", [0, 0]), ("b", [1, 0])])
    assert v.nearest(1, vector=[0.0, 0.0]) == ["a"]


def test_nearest_key_xor_vector():
    v = Version("s", "initial", 2)
    v.set("a", [0, 0])
    with pytest.raises(InvalidArgumentError):
        v.nearest(1, key="a", vector=[0.0, 0.0])
    with pytest.raises(InvalidArgumentError):
        v.nearest(1)


def test_version_iterator_snapshot():
    v = Version("s", "initial", 2)
    v.multiset([("a", [1, 0]), ("b", [0, 1])])
    got = dict(v.iterator())
    assert set(got) == {"a", "b"}
    np.testing.assert_array_equal(got["a"], [1, 0])


def test_version_delete():
    v = Version("s", "initial", 2)
    v.multiset([("a", [0, 0]), ("b", [9, 9])])
    v.delete("a")
    assert "a" not in v
    with pytest.raises(KeyNotFoundError):
        v.get("a")
    assert v.nearest(1, vector=[0.0, 0.0]) == ["b"]


def test_hub_space_lifecycle():
    hub = EmbeddingHub.in_memory()
    hub.create_space("s1", dims=3)
    hub.create_space("s2", dims=4)
    assert set(hub.spaces()) == {"s1", "s2"}
    # idempotent create returns the same space (embedding_store.cc:33-36)
    s1 = hub.create_space("s1", dims=3)
    assert s1 is hub.get_space("s1")
    hub.delete_space("s1")
    assert hub.get_space("s1") is None
    v = hub.get_version("s2")
    assert v is not None and v.dims == 4


def test_hub_multi_space_isolation():
    hub = EmbeddingHub.in_memory()
    hub.create_space("a", dims=3)
    hub.create_space("b", dims=3)
    hub.get_version("a").set("key", [1, 2, 3])
    hub.get_version("b").set("key", [3, 2, 1])
    np.testing.assert_array_equal(hub.get_version("a").get("key"), [1, 2, 3])
    np.testing.assert_array_equal(hub.get_version("b").get("key"), [3, 2, 1])


def test_persistence_wal_recovery(tmp_path):
    hub = EmbeddingHub.load_or_create(tmp_path / "store")
    hub.create_space("s", dims=3)
    v = hub.get_version("s")
    v.multiset([("a", [1, 2, 3]), ("b", [4, 5, 6])])
    # no explicit save: recovery must come purely from the WAL
    hub2 = EmbeddingHub.load_or_create(tmp_path / "store")
    v2 = hub2.get_version("s")
    assert v2 is not None
    np.testing.assert_array_equal(v2.get("a"), [1, 2, 3])
    np.testing.assert_array_equal(v2.get("b"), [4, 5, 6])


def test_persistence_snapshot_and_tail(tmp_path):
    hub = EmbeddingHub.load_or_create(tmp_path / "store")
    hub.create_space("s", dims=2)
    v = hub.get_version("s")
    v.set("a", [1, 1])
    hub.save()  # snapshot subsumes WAL
    v.set("b", [2, 2])  # tail write after snapshot
    v.make_immutable()

    hub2 = EmbeddingHub.load_or_create(tmp_path / "store")
    v2 = hub2.get_version("s")
    np.testing.assert_array_equal(v2.get("a"), [1, 1])
    np.testing.assert_array_equal(v2.get("b"), [2, 2])
    assert v2.immutable
    with pytest.raises(ImmutableVersionError):
        v2.set("c", [3, 3])


def test_persistence_search_after_reload(tmp_path):
    hub = EmbeddingHub.load_or_create(tmp_path / "store")
    hub.create_space("s", dims=4)
    v = hub.get_version("s")
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((50, 4)).astype(np.float32)
    v.multiset([(f"k{i}", vecs[i]) for i in range(50)])
    hub.save()

    hub2 = EmbeddingHub.load_or_create(tmp_path / "store")
    v2 = hub2.get_version("s")
    assert v2.nearest(1, key="k7") != ["k7"]
    assert v2.nearest(1, vector=vecs[7]) == ["k7"]


def test_multiset_duplicate_keys_keep_last():
    """Duplicate keys in one batch must not inflate the size counter and
    must honor last-write-wins (ADVICE r1)."""
    v = Version("s", "initial", 4)
    v.multiset([("a", [1, 0, 0, 0]), ("b", [0, 1, 0, 0]), ("a", [9, 9, 9, 9])])
    assert v.size == 2
    assert v.index.size == 2
    assert list(v.get("a")) == [9, 9, 9, 9]


def test_snapshot_dirs_are_fresh_and_stale_arrays_dropped(tmp_path):
    """Each save_version writes a fresh index-NNNNNN dir; arrays from an
    older snapshot (e.g. an upper-level file from a taller HNSW) must not
    leak into a reload (ADVICE r1)."""
    from embeddinghub_tpu.store import persistence

    v = Version("s", "initial", 4)
    v.multiset([(f"k{i}", np.eye(4, dtype=np.float32)[i % 4]) for i in range(8)])
    persistence.save_version(tmp_path, v)
    first = json.loads((tmp_path / "meta.json").read_text())["index_dir"]
    # plant a stale array in the first snapshot dir, then save again
    np.save(tmp_path / first / "stale_upper9.npy", np.zeros((2, 3)))
    v.multiset([("extra", [1, 1, 1, 1])])
    persistence.save_version(tmp_path, v)
    second = json.loads((tmp_path / "meta.json").read_text())["index_dir"]
    assert second != first
    assert not (tmp_path / first).exists()  # old snapshot garbage-collected
    v2 = persistence.load_version(tmp_path)
    assert v2.size == 9 and "extra" in v2


def test_hnsw_ef_search_persisted(tmp_path):
    from embeddinghub_tpu.index.hnsw import HNSWIndex
    from embeddinghub_tpu.store import persistence

    idx = HNSWIndex(4, m=4, ef_construction=16, ef_search=77)
    v = Version("s", "initial", 4, index=idx)
    v.multiset([(f"k{i}", np.random.default_rng(i).standard_normal(4)) for i in range(20)])
    persistence.save_version(tmp_path, v)
    v2 = persistence.load_version(tmp_path)
    assert v2.index.ef_search == 77


def test_version_quant_audit_and_freeze_hook(monkeypatch, rng=None):
    """Version.audit_quantization escalates a containment-degraded
    quantized arena; EMBEDDINGHUB_QUANT_AUDIT=freeze runs it at
    make_immutable (the load->serve transition)."""
    import numpy as np
    from embeddinghub_tpu.index.flat import FlatIndex
    from embeddinghub_tpu.store.version import Version
    from embeddinghub_tpu.utils import config as cfg

    rng = np.random.default_rng(9)
    n, d = 4096, 32
    u = rng.standard_normal(d).astype(np.float32)
    u /= np.linalg.norm(u)
    x = u[None, :] + 5e-2 * rng.standard_normal((n, d)).astype(np.float32)
    x[:, -1] = 50.0 * rng.choice([-1.0, 1.0], n)  # per-row scale inflation

    idx = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                    capacity=n, quant_guard=False)
    v = Version("s", "initial", d, metric="l2", index=idx)
    v.multiset((f"k{i}", x[i]) for i in range(n))

    # explicit audit escalates
    report = v.audit_quantization(bar=0.95, nq=24)
    assert report["escalated"], report

    # freeze hook: opt-in via env, auto-audits a fresh degraded version
    idx2 = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                     capacity=n, quant_guard=False)
    v2 = Version("s", "v2", d, metric="l2", index=idx2)
    v2.multiset((f"k{i}", x[i]) for i in range(n))
    monkeypatch.setattr(cfg, "_config", None)
    monkeypatch.setenv("EMBEDDINGHUB_QUANT_AUDIT", "freeze")
    v2.make_immutable()
    assert idx2.storage_dtype != "int8x2"
    monkeypatch.setattr(cfg, "_config", None)

    # engines without a quantized arena: clean no-op report
    v3 = Version("s", "v3", d, metric="l2")
    v3.multiset([("a", x[0])])
    rep3 = v3.audit_quantization()
    assert rep3 == {"audited": [], "escalated": [], "fit_blocked": None}


def test_flat_quant_planes_and_boost_persist(tmp_path):
    """Snapshots of quantized arenas persist the quantized device planes
    + the audit's pool boost (flat_meta[1]); restore adopts them as
    copy-on-write mmaps instead of re-quantizing the whole arena (the
    dominant term of the r4 203 s restore-at-10M, RESULTS.md)."""
    from embeddinghub_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(3)
    n, d = 512, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                    capacity=n, quant_guard=False)
    idx.add(np.arange(n), x)
    idx.search(x[:4], 5)  # full sync builds + caches the planes
    idx.oversample_boost = 4
    arrs = idx.state_arrays()
    assert {"q_hi", "q_lo", "q_sq", "q_sc"} <= set(arrs)
    for name, arr in arrs.items():
        np.save(tmp_path / f"{name}.npy", arr)
    loaded = {
        p.stem: np.load(p, mmap_mode="c") for p in tmp_path.glob("*.npy")
    }
    idx2 = FlatIndex.from_state(d, "l2", loaded)
    assert idx2.oversample_boost == 4
    assert idx2.storage_dtype == "int8x2"
    # planes adopted byte-identical — restore skips re-quantization
    assert idx2._hq is not None
    assert np.array_equal(np.asarray(idx2._hq["hi"]),
                          np.asarray(idx._hq["hi"]))
    # host arena adopted as the COW memmap (no eager copy)
    assert isinstance(idx2._hx, np.memmap)
    assert np.array_equal(idx2.vector(3), x[3])
    _, ids = idx2.search(x[:8], 1)
    assert np.array_equal(np.asarray(ids).ravel(), np.arange(8))
    # post-restore point write (the WAL-tail path) keeps the planes
    # row-accurate instead of dropping them
    nv = (3.0 * rng.standard_normal(d)).astype(np.float32)
    idx2.add([5], nv[None, :])
    assert idx2._hq is not None
    _, hit = idx2.search(nv[None, :], 1)
    assert hit[0, 0] == 5
