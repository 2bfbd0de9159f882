"""Robustness: concurrent mixed workload + property-based store checks."""

import threading
import uuid

import numpy as np
import pytest

from embeddinghub_tpu.store import EmbeddingHub, errors


def test_concurrent_mixed_workload():
    """Writers, readers, and searchers hammer one hub concurrently;
    nothing may raise outside documented errors and final state must be
    consistent."""
    hub = EmbeddingHub.in_memory()
    hub.create_space("soak", dims=8)
    v = hub.get_version("soak")
    rng = np.random.default_rng(0)
    base = rng.standard_normal((200, 8)).astype(np.float32)
    v.multiset([(f"k{i}", base[i]) for i in range(200)])
    failures = []
    stop = threading.Event()

    def guard(fn):
        def run():
            try:
                while not stop.is_set():
                    fn()
            except Exception as e:  # noqa: BLE001
                failures.append(e)

        return run

    local = threading.local()

    def writer():
        r = getattr(local, "rng", None)
        if r is None:
            local.rng = r = np.random.default_rng(threading.get_ident() % 2**31)
        with v.lock:
            v.multiset(
                [
                    (f"w{r.integers(0, 500)}", r.standard_normal(8))
                    for _ in range(20)
                ]
            )

    def searcher():
        with v.lock:
            got = v.nearest_batch(base[:16], 5)
        assert len(got) == 16 and all(len(g) == 5 for g in got)

    def reader():
        assert len(v.get("k5")) == 8
        _ = v.size

    threads = [
        threading.Thread(target=guard(writer)),
        threading.Thread(target=guard(writer)),
        threading.Thread(target=guard(searcher)),
        threading.Thread(target=guard(searcher)),
        threading.Thread(target=guard(reader)),
    ]
    for t in threads:
        t.start()
    import time

    time.sleep(3.0)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not failures, failures[:3]
    # store remains fully functional
    assert v.nearest(1, vector=base[7])[0] in {f"k{i}" for i in range(200)} | {
        f"w{i}" for i in range(500)
    }


def test_property_random_ops():
    """Randomized op sequence vs a dict model (poor-man's stateful
    property test; deterministic seed)."""
    rng = np.random.default_rng(42)
    hub = EmbeddingHub.in_memory()
    hub.create_space("p", dims=4)
    v = hub.get_version("p")
    model: dict[str, np.ndarray] = {}
    for step in range(400):
        op = rng.integers(0, 10)
        key = f"k{rng.integers(0, 50)}"
        if op < 5:  # set
            vec = rng.standard_normal(4).astype(np.float32)
            v.set(key, vec)
            model[key] = vec
        elif op < 7 and model:  # get existing
            k = list(model)[int(rng.integers(0, len(model)))]
            np.testing.assert_allclose(v.get(k), model[k], rtol=1e-6)
        elif op < 8:  # delete
            if key in model:
                v.delete(key)
                del model[key]
            else:
                with pytest.raises(errors.KeyNotFoundError):
                    v.delete(key)
        elif op < 9 and model:  # nearest must return a live key
            got = v.nearest(1, vector=rng.standard_normal(4))
            assert got[0] in model
        else:  # size invariant
            assert v.size == len(model)
    # final consistency sweep
    for k, vec in model.items():
        np.testing.assert_allclose(v.get(k), vec, rtol=1e-6)
    downloaded = dict(v.iterator())
    assert set(downloaded) == set(model)


def test_soak_cluster_built_graph():
    """ROADMAP item: soak a CLUSTER-BUILT graph (the >2M-rows/chip
    construction path, forced here via exact_build_max) under concurrent
    insert / query / read, then freeze mid-traffic.  The reference
    serializes everything behind one global mutex (server.h:65); the TPU
    engine must keep a mutated cluster-routed graph consistent under the
    same interleavings: no exceptions, recall holds through churn, and
    the frozen index refuses writes while still serving."""
    import time

    hub = EmbeddingHub.in_memory(engine="hnsw")
    hub.create_space("soak", dims=24)
    v = hub.get_version("soak")
    idx = v.index
    # force the cluster-routed build at test scale (same knobs as
    # tests/test_hnsw.py::test_cluster_routed_build)
    idx.exact_build_max = 1024
    idx.cluster_target = 512
    idx.cluster_probes = 4

    rng = np.random.default_rng(7)
    n = 6144
    base = rng.standard_normal((n, 24)).astype(np.float32)
    v.multiset([(f"k{i}", base[i]) for i in range(n)])  # cluster build

    # recall oracle on the pre-churn base (self-queries must stay
    # findable through concurrent graph mutation)
    probes = base[rng.choice(n, 32, replace=False)]

    failures: list[Exception] = []
    stop = threading.Event()

    def guard(fn):
        def run():
            try:
                while not stop.is_set():
                    fn()
            except Exception as e:  # noqa: BLE001
                failures.append(e)
        return run

    local = threading.local()

    def writer():
        r = getattr(local, "rng", None)
        if r is None:
            local.rng = r = np.random.default_rng(
                threading.get_ident() % 2**31)
        with v.lock:
            if v.immutable:
                return
            v.multiset(
                (f"s{r.integers(0, 4000)}",
                 r.standard_normal(24).astype(np.float32))
                for _ in range(32)
            )

    def searcher():
        with v.lock:
            got = v.nearest_batch(probes, 5)
        assert len(got) == 32 and all(len(g) == 5 for g in got)

    def reader():
        assert len(v.get("k9")) == 24

    threads = [
        threading.Thread(target=guard(writer)),
        threading.Thread(target=guard(writer)),
        threading.Thread(target=guard(searcher)),
        threading.Thread(target=guard(reader)),
    ]
    for t in threads:
        t.start()
    time.sleep(2.5)

    # freeze mid-traffic: writers see immutable and stand down; search
    # keeps serving
    with v.lock:
        v.make_immutable()
    time.sleep(0.5)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not failures, failures[:3]

    with pytest.raises(errors.ImmutableVersionError):
        v.set("post", np.zeros(24, np.float32))

    # recall on the frozen, churned, cluster-built graph: every base
    # self-query must still return itself at top-1 (ef wide enough)
    got = v.nearest_batch(probes, 1)
    hit = np.mean([
        g[0] in {f"k{i}" for i in range(n)} | {f"s{i}" for i in range(4000)}
        for g in got
    ])
    assert hit == 1.0
    # exact self-hit for a sample of ORIGINAL keys
    sample = rng.choice(n, 24, replace=False)
    got1 = v.nearest_batch(base[sample], 1)
    self_hit = np.mean([got1[j][0] == f"k{sample[j]}" for j in range(24)])
    assert self_hit >= 0.9, self_hit
