"""Unit tests for the distance/top-k kernels.

Style mirrors the reference's exact small-vector assertions
(``embeddingstore/test/index_test.cc``) plus randomized oracle checks
against numpy brute force.
"""

import numpy as np
import pytest

from embeddinghub_tpu.ops import (
    chunked_topk_search,
    masked_topk,
    pairwise_dist,
    preprocess_vectors,
    sqnorms,
)

import jax.numpy as jnp


def np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_pairwise_l2_exact_small():
    x = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    q = np.array([[1, 2, 3]], np.float32)
    d = np.asarray(pairwise_dist(jnp.asarray(q), jnp.asarray(x), "l2"))
    np.testing.assert_allclose(d, [[0.0, 27.0]], atol=1e-4)


def test_pairwise_l2_random(rng):
    q = rng.standard_normal((7, 32)).astype(np.float32)
    x = rng.standard_normal((50, 32)).astype(np.float32)
    # The dot-product expansion trades a little fp32 accuracy for MXU
    # throughput; rank order is what matters for k-NN.
    d = np.asarray(pairwise_dist(jnp.asarray(q), jnp.asarray(x), "l2"))
    np.testing.assert_allclose(d, np_l2(q, x), rtol=5e-3, atol=5e-2)


def test_pairwise_cosine(rng):
    q = rng.standard_normal((5, 16)).astype(np.float32)
    x = rng.standard_normal((20, 16)).astype(np.float32)
    xu = np.asarray(preprocess_vectors(jnp.asarray(x), "cosine"))
    d = np.asarray(pairwise_dist(jnp.asarray(q), jnp.asarray(xu), "cosine"))
    qa = q / np.linalg.norm(q, axis=1, keepdims=True)
    xa = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(d, 1.0 - qa @ xa.T, rtol=1e-4, atol=1e-4)


def test_sqnorms(rng):
    x = rng.standard_normal((9, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sqnorms(jnp.asarray(x))), (x**2).sum(1), rtol=1e-5
    )


def test_masked_topk():
    d = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
    valid = jnp.asarray([True, True, True, False])
    dist, idx = masked_topk(d, valid, 2)
    np.testing.assert_allclose(np.asarray(dist), [[1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(idx), [[1, 2]])


@pytest.mark.parametrize("metric", ["l2", "cosine", "ip"])
def test_chunked_topk_matches_bruteforce(rng, metric):
    n, d, b, k = 512, 24, 9, 7
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::5] = False  # holes
    xp = np.asarray(preprocess_vectors(jnp.asarray(x), metric))
    qpad = np.concatenate([q, np.zeros((7, d), np.float32)])  # static B bucket
    dist, idx = chunked_topk_search(
        jnp.asarray(qpad),
        jnp.asarray(xp),
        jnp.asarray(valid),
        sqnorms(jnp.asarray(xp)),
        metric=metric,
        k=k,
        chunk=128,
    )
    dist, idx = np.asarray(dist)[:b], np.asarray(idx)[:b]

    if metric == "l2":
        ref = np_l2(q, x)
    elif metric == "ip":
        ref = 1.0 - q @ x.T
    else:
        qa = q / np.linalg.norm(q, axis=1, keepdims=True)
        xa = x / np.linalg.norm(x, axis=1, keepdims=True)
        ref = 1.0 - qa @ xa.T
    ref[:, ~valid] = np.inf
    ref_idx = np.argsort(ref, axis=1, kind="stable")[:, :k]
    # Compare distance values (ties make index comparison fragile).
    np.testing.assert_allclose(
        dist, np.take_along_axis(ref, ref_idx, axis=1), rtol=1e-3, atol=1e-3
    )
    # And the retrieved rows must actually have those distances.
    np.testing.assert_allclose(
        np.take_along_axis(ref, idx, axis=1), dist, rtol=1e-3, atol=1e-3
    )
    assert not np.isin(idx, np.flatnonzero(~valid)).any()


def test_chunked_topk_k_larger_than_live(rng):
    n, d = 128, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:3] = True
    q = x[:1]
    dist, idx = chunked_topk_search(
        jnp.asarray(q),
        jnp.asarray(x),
        jnp.asarray(valid),
        sqnorms(jnp.asarray(x)),
        metric="l2",
        k=8,
        chunk=128,
    )
    dist = np.asarray(dist)[0]
    assert np.isfinite(dist[:3]).all()
    assert np.isinf(dist[3:]).all()
