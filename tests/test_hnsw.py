"""HNSW index tests: semantics + recall against the exact oracle.

Mirrors reference ``index_test.cc`` exactness style plus the
BASELINE-style recall sweep (small scale; the big sweeps live in
benchmarks/).
"""

import numpy as np
import pytest

from embeddinghub_tpu.index.hnsw import HNSWIndex


def oracle_topk(q, x, k, metric="l2"):
    if metric == "l2":
        d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    else:
        qa = q / np.linalg.norm(q, axis=1, keepdims=True)
        xa = x / np.linalg.norm(x, axis=1, keepdims=True)
        d = 1 - qa @ xa.T
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_small_exact():
    idx = HNSWIndex(dims=3, m=4, ef_construction=16, ef_search=8)
    vecs = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32)
    idx.add(np.arange(3), vecs)
    d, i = idx.search(np.array([[1, 2, 3]], np.float32), k=3)
    assert list(i[0]) == [0, 1, 2]
    np.testing.assert_allclose(d[0], [0.0, 27.0, 108.0], atol=1e-3)


def test_k_zero_and_empty():
    idx = HNSWIndex(dims=2)
    d, i = idx.search(np.zeros((1, 2), np.float32), k=3)
    assert (i == -1).all()
    idx.add([0], [[1.0, 1.0]])
    d, i = idx.search(np.zeros((1, 2), np.float32), k=0)
    assert i.shape == (1, 0)


def test_update_vector_moves_it():
    idx = HNSWIndex(dims=2, m=4, ef_construction=16, ef_search=8)
    idx.add(np.arange(3), [[0.0, 0], [5, 5], [9, 9]])
    idx.add([0], [[8.0, 8.0]])  # move row 0 next to row 2
    _, i = idx.search(np.array([[8.1, 8.1]], np.float32), k=1)
    assert i[0, 0] == 0
    assert idx.size == 3


def test_remove_unlinks():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    idx = HNSWIndex(dims=8, m=8, ef_construction=32, ef_search=32)
    idx.add(np.arange(50), vecs)
    idx.remove([7])
    _, i = idx.search(vecs[7:8], k=10)
    assert 7 not in i[0]
    assert idx.size == 49


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_recall_small(metric, rng):
    n, d, nq, k = 2000, 16, 64, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, metric=metric, m=16, ef_construction=100)
    idx.add(np.arange(n), vecs)
    _, got = idx.search(q, k, ef=64)
    oracle = oracle_topk(q, vecs, k, metric)
    recall = np.mean(
        [len(set(got[i]) & set(oracle[i])) / k for i in range(nq)]
    )
    assert recall >= 0.9, f"recall {recall}"


def test_recall_improves_with_ef(rng):
    n, d, nq, k = 3000, 24, 50, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=12, ef_construction=80)
    idx.add(np.arange(n), vecs)
    oracle = oracle_topk(q, vecs, k)

    def recall(ef):
        _, got = idx.search(q, k, ef=ef)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / k for i in range(nq)]
        )

    r10, r100 = recall(10), recall(100)
    assert r100 >= r10 - 0.02
    assert r100 >= 0.93


def test_incremental_build_matches_bulk(rng):
    """Recall shouldn't collapse when inserting in many small batches."""
    n, d, k = 1500, 16, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((32, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=12, ef_construction=64)
    for start in range(0, n, 100):
        idx.add(np.arange(start, min(start + 100, n)), vecs[start : start + 100])
    oracle = oracle_topk(q, vecs, k)
    _, got = idx.search(q, k, ef=80)
    recall = np.mean([len(set(got[i]) & set(oracle[i])) / k for i in range(32)])
    assert recall >= 0.9, f"recall {recall}"


def test_snapshot_roundtrip(rng):
    n, d = 300, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=8, ef_construction=32)
    idx.add(np.arange(n), vecs)
    state = idx.state_arrays()
    idx2 = HNSWIndex.from_state(d, "l2", state)
    q = vecs[42:43]
    _, a = idx.search(q, 5, ef=50)
    _, b = idx2.search(q, 5, ef=50)
    assert a[0, 0] == b[0, 0] == 42


def test_bulk_build_path(rng):
    """n >= 2048 empty-index adds take the NN-descent bulk path."""
    n, d = 2048, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=16, ef_construction=100)
    idx.add(np.arange(n), vecs)
    assert idx.size == n
    q = rng.standard_normal((64, d)).astype(np.float32)
    oracle = oracle_topk(q, vecs, 10)
    _, got = idx.search(q, 10, ef=80)
    recall = np.mean([len(set(got[i]) & set(oracle[i])) / 10 for i in range(64)])
    assert recall >= 0.85, recall
    # graph structure sane: entry exists, incremental add still works
    assert idx._entry >= 0
    idx.add([n], vecs[0:1] + 0.001)
    _, got = idx.search(vecs[0:1] + 0.001, 1, ef=50)
    assert got[0, 0] in (0, n)


@pytest.mark.slow
def test_bulk_refine_recall_bar(rng):
    """The refined bulk build must clear the BASELINE quality bar
    (recall@10 >= 0.95) at hnswlib-equal params on clustered data — the
    regime where unrefined NN-descent graphs fragment (VERDICT r1)."""
    n, d = 2048, 24
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    assign = rng.integers(0, 16, size=n)
    vecs = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    idx = HNSWIndex(dims=d, m=16, ef_construction=200)
    idx.add(np.arange(n), vecs)
    q = (centers[rng.integers(0, 16, size=128)]
         + rng.standard_normal((128, d))).astype(np.float32)
    oracle = oracle_topk(q, vecs, 10)
    _, got = idx.search(q, 10, ef=100)
    recall = np.mean([len(set(got[i]) & set(oracle[i])) / 10 for i in range(128)])
    assert recall >= 0.95, recall


def test_fused_wave_then_host_surgery(rng):
    """The fused device wave leaves host links stale; updates, removes
    and snapshots must sync the mirror down and stay consistent."""
    n, d, k = 1400, 16, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=12, ef_construction=64)
    idx.add(np.arange(1000), vecs[:1000])      # crosses the tiny bar
    idx.add(np.arange(1000, n), vecs[1000:])   # pure fused waves
    assert idx._host_stale                     # device is authoritative

    # snapshot syncs down and round-trips
    state = idx.state_arrays()
    assert not idx._host_stale
    idx2 = HNSWIndex.from_state(d, "l2", state)
    q = vecs[1200:1201]
    _, a = idx.search(q, k, ef=80)
    _, b = idx2.search(q, k, ef=80)
    assert a[0, 0] == b[0, 0] == 1200

    # update a fused-inserted row: it must move
    newv = rng.standard_normal(d).astype(np.float32) * 10
    idx.add(np.asarray([1200]), newv[None])
    _, got = idx.search(newv[None], 1, ef=80)
    assert got[0, 0] == 1200

    # remove a row: it must disappear from results
    idx.remove(np.asarray([1201]))
    _, got = idx.search(vecs[1201:1202], 10, ef=80)
    assert 1201 not in got[0]
    assert idx.size == n - 1


def test_fused_stream_recall_on_bulk_graph(rng):
    """Streaming fused waves into a bulk-built graph keeps recall."""
    n, extra, d, k = 2048, 512, 16, 10
    vecs = rng.standard_normal((n + extra, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=12, ef_construction=64)
    idx.add(np.arange(n), vecs[:n])            # bulk NN-descent path
    for s in range(n, n + extra, 128):
        idx.add(np.arange(s, s + 128), vecs[s : s + 128])
    q = rng.standard_normal((32, d)).astype(np.float32)
    oracle = oracle_topk(q, vecs, k)
    _, got = idx.search(q, k, ef=100)
    recall = np.mean([len(set(got[i]) & set(oracle[i])) / k for i in range(32)])
    assert recall >= 0.9, f"recall {recall}"
    # streamed rows must be findable by their own vector
    probe = np.arange(n, n + extra, 37)
    _, got = idx.search(vecs[probe], 1, ef=80)
    assert (got[:, 0] == probe).mean() >= 0.95


def test_refine_repairs_streamed_graph(rng):
    """refine() re-selects layer-0 forward links against the full arena
    and globally re-symmetrizes — recall after a hybrid (core+stream)
    build must not decrease, and typically improves (measured 0.9375 ->
    0.9646 @ef64 on this shape)."""
    n, d = 6144, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((32, d)).astype(np.float32)
    dd = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    oracle = np.argsort(dd, axis=1)[:, :10]

    idx = HNSWIndex(d, m=8, ef_construction=48, capacity=n)
    idx.exact_full_max = 2048
    idx.stream_base = 2048
    idx.max_wave = 1024
    idx.add(np.arange(n), x)

    def recall():
        _, got = idx.search(q, 10, ef=64)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / 10 for i in range(len(q))]
        )

    before = recall()
    idx.refine()
    after = recall()
    assert after >= before - 0.02, (before, after)
    assert after >= 0.9, after
    # graph remains fully usable: snapshot arrays round-trip
    arrays = idx.state_arrays()
    idx2 = HNSWIndex.from_state(d, "l2", arrays)
    _, got2 = idx2.search(q, 10, ef=64)
    rec2 = np.mean(
        [len(set(got2[i]) & set(oracle[i])) / 10 for i in range(len(q))]
    )
    assert rec2 >= after - 0.02, (after, rec2)


def test_graph_churn_and_refine_repair(rng):
    """Heavy update churn (the reference's re-addPoint path) must not
    rot the graph below a usable bar, and refine() restores full-data
    link quality afterwards."""
    n, d = 3072, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(d, m=8, ef_construction=48, capacity=n)
    idx.add(np.arange(n), x)

    # churn: 6 rounds of remove + re-add with moved vectors + updates
    for r in range(6):
        victims = rng.choice(n, 128, replace=False)
        idx.remove(victims[:64])
        x[victims[:64]] = rng.standard_normal((64, d)).astype(np.float32)
        idx.add(victims[:64], x[victims[:64]])  # re-insert moved rows
        x[victims[64:]] += 0.1 * rng.standard_normal((64, d)).astype(
            np.float32
        )
        idx.add(victims[64:], x[victims[64:]])  # in-place updates

    q = rng.standard_normal((48, d)).astype(np.float32)
    dd = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    oracle = np.argsort(dd, axis=1)[:, :10]

    def recall():
        _, got = idx.search(q, 10, ef=64)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / 10 for i in range(len(q))]
        )

    churned = recall()
    assert churned >= 0.85, churned
    idx.refine()
    repaired = recall()
    assert repaired >= churned - 0.02, (churned, repaired)
    assert repaired >= 0.9, (churned, repaired)
    # every stored vector still retrievable exactly
    probe = rng.choice(n, 64, replace=False)
    _, i1 = idx.search(x[probe] + 1e-5, 1, ef=64)
    assert (i1[:, 0] == probe).mean() >= 0.95


def test_cluster_routed_build(rng):
    """Cluster-routed construction (the >2M-rows/chip scaling path,
    index/hnsw._cluster_build_fwd): k-means-routed near-exact pools must
    land within a few recall points of the exact-scan build, and the
    graph must behave identically downstream (search, snapshot, stream).

    Forced here by dropping `exact_build_max` below n; worst-case
    (unclustered gaussian) data so routing gets no free lunch."""
    n, d, k = 8192, 24, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((64, d)).astype(np.float32)
    oracle = oracle_topk(q, x, k)

    idx = HNSWIndex(d, m=16, ef_construction=100, capacity=n)
    idx.exact_build_max = 1024      # force the cluster path at n=8192
    idx.cluster_target = 512
    idx.cluster_probes = 4          # scans 4/16 of the arena per pool
    idx.add(np.arange(n), x)

    def recall(index, ef):
        _, got = index.search(q, k, ef=ef)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / k for i in range(len(q))]
        )

    r100 = recall(idx, 100)
    assert r100 >= 0.93, r100

    # streamed rows on top of a cluster-built core stay findable
    extra = rng.standard_normal((256, d)).astype(np.float32)
    idx.add(np.arange(n, n + 256), extra)
    _, got = idx.search(extra[::16], 1, ef=80)
    assert (got[:, 0] == np.arange(n, n + 256)[::16]).mean() >= 0.9

    # snapshot arrays round-trip the cluster-built graph: the restored
    # index must answer exactly like the live (post-stream) one.  NOTE:
    # comparing against `oracle` here would be wrong — the 256 streamed
    # rows come from the same distribution and legitimately displace
    # pre-stream top-k entries.
    arrays = idx.state_arrays()
    idx2 = HNSWIndex.from_state(d, "l2", arrays)
    _, live = idx.search(q, k, ef=100)
    _, restored = idx2.search(q, k, ef=100)
    np.testing.assert_array_equal(restored, live)


def test_cluster_build_skewed_truncation(rng):
    """Adversarial cluster-routed build (VERDICT r3 weak #7): a
    near-duplicate blob that bf16 k-means assignment cannot split (ties
    collapse it into ONE giant cluster, the Deep-10M clustered regime)
    plus a gaussian bulk.  Must (a) actually hit the arena-truncation
    path incl. the oversized-own-cluster branch, (b) stay within a few
    recall points of the exact-scan build on the same data, (c) keep
    blob queries answerable (the truncated giant cluster is exactly
    where naive prefix-cuts lose candidates)."""
    n_blob, n_bulk, d, k = 6144, 10240, 16, 10
    n = n_blob + n_bulk
    c0 = rng.standard_normal(d).astype(np.float32)
    x = np.concatenate([
        c0[None, :] + rng.normal(0, 1e-4, (n_blob, d)).astype(np.float32),
        rng.standard_normal((n_bulk, d)).astype(np.float32) * 3.0,
    ])
    perm = rng.permutation(n)
    x = x[perm].astype(np.float32)
    is_blob = perm < n_blob

    q_bulk = x[np.flatnonzero(~is_blob)[:48]] + 1e-3
    q_blob = x[np.flatnonzero(is_blob)[:16]].copy()

    def build(cluster: bool):
        idx = HNSWIndex(d, m=16, ef_construction=100, capacity=n)
        if cluster:
            idx.exact_build_max = 1024
            idx.cluster_target = 512
            idx.cluster_probes = 4      # S = 2048 << blob size
        idx.add(np.arange(n), x)
        return idx

    idx_c = build(cluster=True)
    stats = idx_c._cluster_stats
    assert stats["truncated"] > 0, stats
    assert stats["own_truncated"] >= 1, stats  # the blob cluster

    idx_e = build(cluster=False)

    def dist_recall(index, q, ef):
        """Ties-robust recall: retrieved counts as correct if its true
        L2 is within (1 + 1e-3) of the oracle k-th distance, plus an
        absolute slack far below data scale but far above blob diameter
        (near-dup gaps ~1e-8 sit below bf16 score resolution; any blob
        member is a semantically perfect answer for a blob query)."""
        d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        kth = np.sort(d2, axis=1)[:, k - 1]
        dd, got = index.search(q, k, ef=ef)
        true = ((q[:, None, :] - x[got]) ** 2).sum(-1)
        ok = (true <= kth[:, None] * (1 + 1e-3) + 1e-3) & (got >= 0)
        return ok.mean()

    r_c = dist_recall(idx_c, q_bulk, ef=100)
    r_e = dist_recall(idx_e, q_bulk, ef=100)
    assert r_c >= r_e - 0.03, (r_c, r_e)
    assert r_c >= 0.90, r_c

    # blob queries: truncated giant cluster must still answer (any
    # blob member is a near-tie; distance recall absorbs that)
    rb = dist_recall(idx_c, q_blob, ef=100)
    assert rb >= 0.90, rb


def test_routed_multi_entry_search(rng):
    """Centroid-routed multi-entry beam seeding (HNSWIndex.build_route):
    same graph, same ef — only the beam's starting set changes — so
    recall must never drop below the classic single-entry search, and
    on clustered data (where greedy descent strands in local minima)
    it should recover it. Works on any construction path."""
    n, d, k = 6144, 24, 10
    # clustered data: the adversarial regime for a single-entry descent
    centers = 3.0 * rng.standard_normal((48, d)).astype(np.float32)
    assign = rng.integers(0, 48, n)
    x = (centers[assign] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    q = (centers[rng.integers(0, 48, 64)]
         + 0.3 * rng.standard_normal((64, d))).astype(np.float32)
    oracle = oracle_topk(q, x, k)

    idx = HNSWIndex(d, m=8, ef_construction=60, capacity=n)
    idx.exact_build_max = 512        # cluster path, stores routing state
    idx.cluster_target = 256
    idx.cluster_probes = 4
    idx.add(np.arange(n), x)

    def recall(ef):
        _, got = idx.search(q, k, ef=ef)
        return np.mean(
            [len(set(got[i]) & set(oracle[i])) / k for i in range(len(q))]
        )

    base = recall(40)
    idx.build_route(seed_probes=8)
    seeded = recall(40)
    assert seeded >= base - 0.01, (base, seeded)
    assert seeded >= 0.9, seeded

    # toggling back restores the classic path
    idx.seed_probes = 0
    assert abs(recall(40) - base) < 1e-6

    # build_route also works when NO cluster state exists (exact build)
    idx2 = HNSWIndex(d, m=8, ef_construction=60, capacity=2048)
    x2 = x[:2048]
    idx2.add(np.arange(2048), x2)
    assert not hasattr(idx2, "_cluster_route")
    idx2.build_route(seed_probes=4)
    o2 = oracle_topk(q, x2, k)
    _, got = idx2.search(q, k, ef=40)
    r2 = np.mean([len(set(got[i]) & set(o2[i])) / k for i in range(len(q))])
    assert r2 >= 0.9, r2

    # removed medoid rows are masked seeds, not crashes
    med = [m for m in idx2._cluster_route["medoids"] if m >= 0][:2]
    idx2.remove(np.asarray(med, np.int64))
    _, got = idx2.search(q[:8], k, ef=40)
    assert got.shape == (8, k)


def test_routed_search_snapshot_roundtrip(rng):
    """Routing state (centroids + medoids + seed_probes) persists in
    state_arrays, so a restored index answers seeded searches
    identically to the live one."""
    n, d, k = 2048, 16, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(d, m=8, ef_construction=50, capacity=n)
    idx.add(np.arange(n), x)
    idx.build_route(seed_probes=4)
    q = rng.standard_normal((16, d)).astype(np.float32)
    _, live = idx.search(q, k, ef=40)

    idx2 = HNSWIndex.from_state(d, "l2", idx.state_arrays())
    assert idx2.seed_probes == 4
    _, restored = idx2.search(q, k, ef=40)
    np.testing.assert_array_equal(restored, live)


def test_auto_route_trigger(rng):
    """auto_seed_probes: the route builds itself when size crosses
    auto_route_min, and refits after the index doubles past the
    route's build size (the store's EMBEDDINGHUB_HNSW_SEED_PROBES
    knob plumbs to this)."""
    n, d = 1536, 12
    x = rng.standard_normal((2 * n, d)).astype(np.float32)
    idx = HNSWIndex(d, m=8, ef_construction=40, capacity=2 * n)
    idx.auto_seed_probes = 4
    idx.auto_route_min = 1024
    idx.add(np.arange(512), x[:512])
    idx.search(x[:4], 3, ef=20)                 # below min: no route
    assert getattr(idx, "_cluster_route", None) is None
    idx.add(np.arange(512, n), x[512:n])
    idx.search(x[:4], 3, ef=20)                 # crossed min: builds
    assert idx._cluster_route.get("built_size") == n
    assert idx.seed_probes == 4
    idx.add(np.arange(n, 2 * n + 0), x[n:])
    idx.search(x[:4], 3, ef=20)                 # doubled: refits
    assert idx._cluster_route["built_size"] == 2 * n


def test_member_arena_invariants(rng):
    """The fused wave's upper-layer pools read compacted member-id
    arenas (ops/wave_insert._member_scan_topk) instead of full-arena
    masked scans. Invariants: device mcount tracks the true layer
    population through streamed waves, forced slab regrowth, and
    host-surgery rebuilds; pools stay quality-equal to the flat scan."""
    n, extra, d = 1500, 1024, 16
    vecs = rng.standard_normal((n + extra, d)).astype(np.float32)
    idx = HNSWIndex(dims=d, m=8, ef_construction=48, capacity=8192)
    idx._member_slab_width = lambda: 8  # force device-side regrowth
    idx.add(np.arange(n), vecs[:n])
    for s in range(n, n + extra, 256):
        idx.add(np.arange(s, s + 256), vecs[s : s + 256])

    st = idx._device_state
    mem, mc = np.asarray(st["members"]), np.asarray(st["mcount"])
    assert mem.shape[1] > 8  # regrowth actually happened
    for layer in range(1, mem.shape[0] + 1):
        true_pop = int((idx._levels >= layer).sum())
        # host mirror is exact; device count matches it
        assert idx._mcount_host[layer - 1] == mc[layer - 1]
        live = mem[layer - 1][: mc[layer - 1]]
        assert mc[layer - 1] == true_pop
        assert set(map(int, live[live >= 0])) == set(
            map(int, np.flatnonzero(idx._levels >= layer))
        )

    # host surgery (remove an upper-layer member) then more waves:
    # _flush_delta rebuilds the arenas from the host level table
    upper_nodes = np.flatnonzero(idx._levels >= 1)
    idx.remove(upper_nodes[:2])
    idx.add(upper_nodes[:2], vecs[upper_nodes[:2]] + 0.01)
    st = idx._device_arrays()
    mem, mc = np.asarray(st["members"]), np.asarray(st["mcount"])
    for layer in range(1, mem.shape[0] + 1):
        assert mc[layer - 1] == int((idx._levels >= layer).sum())

    # quality: streamed graph still finds its own rows
    probe = np.arange(n, n + extra, 41)
    _, got = idx.search(vecs[probe], 1, ef=64)
    assert (got[:, 0] == probe).mean() >= 0.95
