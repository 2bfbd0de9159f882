"""Beam-search serving-walk shape knobs (ops/beam.beam_search).

``spec=2`` (speculative two-hop expansion per loop iteration) and
``exit_k`` (stop when the top-k pool prefix is converged, not all ef)
change only the walk SCHEDULE — recall at a given ef must stay in the
same band as the classic (hnswlib-order, reference index.cc:41-51)
walk, while iteration counts drop.  These tests pin that contract on a
brute-force kNN graph where the oracle is exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from embeddinghub_tpu.ops import beam as beam_ops


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(3)
    n, d, m = 4000, 32, 12
    x = rng.standard_normal((n, d)).astype(np.float32)
    d2 = ((x[:, None, :16] - x[None, :, :16]) ** 2).sum(-1)  # cheap proxy
    # true kNN graph on the full vectors, chunked
    nb = np.empty((n, m), np.int32)
    full = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(full, np.inf)
    nb[:] = np.argsort(full, axis=1)[:, :m]
    del d2
    q = x[:64] + 0.01 * rng.standard_normal((64, d)).astype(np.float32)
    oracle = np.argsort(
        ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1), axis=1
    )[:, :10]
    return x, nb, q, oracle


def _run(graph, **kw):
    x, nb, q, oracle = graph
    n = x.shape[0]
    xd = jnp.asarray(x)
    x_sq = jnp.einsum("nd,nd->n", xd, xd)
    valid = jnp.ones((n,), bool)
    entry = jnp.zeros((len(q),), jnp.int32)
    d, ids, hops = beam_ops.beam_search(
        jnp.asarray(q), entry, jnp.asarray(nb), xd, x_sq, valid,
        metric="l2", with_hops=True, **kw,
    )
    ids = np.asarray(ids)[:, :10]
    rec = np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(q))
    ])
    return rec, int(hops), np.asarray(d), ids


def test_spec2_matches_classic_recall(graph):
    rec1, hops1, d1, _ = _run(graph, ef=64, expand=4, spec=1)
    rec2, hops2, d2, _ = _run(graph, ef=64, expand=4, spec=2)
    assert rec1 >= 0.9  # directed 12-NN toy graph; relative bar below
                        # is the contract under test
    assert rec2 >= rec1 - 0.02, (rec1, rec2)
    # the whole point: 2-hop coverage per iteration => fewer iterations
    assert hops2 < hops1, (hops1, hops2)


def test_spec2_distances_sorted_and_valid(graph):
    x, nb, q, oracle = graph
    rec, hops, d, ids = _run(graph, ef=48, expand=4, spec=2)
    assert (np.diff(d, axis=1) >= -1e-6).all()  # ascending pools
    live = ids >= 0
    assert live.all()  # n >> ef: pool must fill completely
    assert (ids < x.shape[0]).all()


def test_exit_k_early_stop(graph):
    rec_full, hops_full, _, _ = _run(graph, ef=96, expand=4)
    rec_k, hops_k, _, _ = _run(graph, ef=96, expand=4, exit_k=10)
    assert hops_k <= hops_full
    assert rec_k >= rec_full - 0.03, (rec_full, rec_k)


def test_spec2_with_multiseed(graph):
    x, nb, q, oracle = graph
    # 4 seeds per query incl. duplicates + a -1 pad
    entry = np.zeros((len(q), 4), np.int32)
    entry[:, 1] = 17
    entry[:, 2] = 17      # duplicate seed must be masked
    entry[:, 3] = -1      # padding seed must be ignored
    xd = jnp.asarray(x)
    x_sq = jnp.einsum("nd,nd->n", xd, xd)
    d, ids = beam_ops.beam_search(
        jnp.asarray(q), jnp.asarray(entry), jnp.asarray(nb), xd, x_sq,
        jnp.ones((x.shape[0],), bool), metric="l2", ef=64, expand=4,
        spec=2,
    )
    ids = np.asarray(ids)
    # no id may appear twice in a pool
    for row in ids:
        r = row[row >= 0]
        assert len(set(r.tolist())) == len(r)


def test_hnsw_index_spec_exit_serving(tmp_path):
    """Index-level: spec/exit_k knobs serve the same results."""
    from embeddinghub_tpu.index.hnsw import HNSWIndex

    rng = np.random.default_rng(5)
    n, d = 3000, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(d, metric="l2", m=8, ef_construction=80, capacity=n)
    idx.add(np.arange(n), x)
    q = x[:32] + 0.005 * rng.standard_normal((32, d)).astype(np.float32)
    oracle = np.argsort(
        ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1), axis=1
    )[:, :10]

    def rec_of(ids):
        return np.mean([
            len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
            for i in range(len(q))
        ])

    _, ids_classic = idx.search(q, 10, ef=64)
    idx.spec, idx.exit_k = 2, 16
    _, ids_fast = idx.search(q, 10, ef=64)
    r1, r2 = rec_of(np.asarray(ids_classic)), rec_of(np.asarray(ids_fast))
    assert r1 >= 0.9
    assert r2 >= r1 - 0.05, (r1, r2)
