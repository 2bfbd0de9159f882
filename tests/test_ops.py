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


@pytest.mark.parametrize("metric", ["l2", "cosine", "ip"])
@pytest.mark.parametrize("exact_matmul", [True, False])
def test_certified_topk_matches_bruteforce(rng, metric, exact_matmul):
    from embeddinghub_tpu.ops import certified_topk_search

    n, d, b, k = 4096, 24, 9, 7
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::5] = False
    xp = np.asarray(preprocess_vectors(jnp.asarray(x), metric))
    qpad = np.concatenate([q, np.zeros((7, d), np.float32)])
    dist, idx, ok = certified_topk_search(
        jnp.asarray(qpad),
        jnp.asarray(xp),
        jnp.asarray(valid),
        sqnorms(jnp.asarray(xp)),
        metric=metric,
        k=k,
        exact_matmul=exact_matmul,
    )
    assert np.asarray(ok).all()  # CPU approx_max_k is exact -> certified
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
    np.testing.assert_allclose(
        dist, np.take_along_axis(ref, ref_idx, axis=1), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.take_along_axis(ref, idx, axis=1), dist, rtol=1e-3, atol=1e-3
    )
    assert not np.isin(idx, np.flatnonzero(~valid)).any()


def test_margin_certificate_sound_on_near_duplicates(rng):
    """exact_matmul=False certifies vs TRUE f32 scores via an
    eps-margin count.  On adversarial near-duplicate clusters (score
    gaps below bf16 resolution) rows may FAIL the certificate — but a
    row that passes must be exactly right."""
    from embeddinghub_tpu.ops import certified_topk_search

    n, d, b, k = 4096, 32, 32, 10
    # 16 tight clusters: members differ by ~1e-4 << bf16 score noise
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    x = (
        centers[rng.integers(0, 16, n)]
        + 1e-4 * rng.standard_normal((n, d)).astype(np.float32)
    )
    q = centers[rng.integers(0, 16, b)] + 1e-4 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    valid = np.ones(n, bool)
    dist, idx, ok = certified_topk_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid),
        sqnorms(jnp.asarray(x)), metric="l2", k=k, exact_matmul=False,
    )
    dist, idx, ok = np.asarray(dist), np.asarray(idx), np.asarray(ok)
    ref = np_l2(q, x)
    ref_sorted = np.sort(ref, axis=1)[:, :k]
    for i in range(b):
        if not ok[i]:
            continue  # failing rows go to the exact re-scan — allowed
        got = np.sort(ref[i, idx[i]])
        # distance-set equality (tie-tolerant): the certified row's
        # returned set must match the true top-k distances
        np.testing.assert_allclose(got, ref_sorted[i], rtol=1e-5, atol=1e-6)


def test_margin_eps_bound_holds(rng):
    """The rounding bound underlying the margin certificate:
    |s_bf16 - s_true| <= C * ||q|| * ||x_col|| with C = 2^-6 (l2,
    incl. 2x safety).  Checked empirically on scaled gaussian data."""
    n, d, b = 2048, 128, 64
    x = (rng.standard_normal((n, d)) * rng.uniform(0.1, 10, (n, 1))).astype(
        np.float32
    )
    q = (rng.standard_normal((b, d)) * rng.uniform(0.1, 10, (b, 1))).astype(
        np.float32
    )
    dots_true = (q.astype(np.float64) @ x.T.astype(np.float64)).astype(
        np.float64
    )
    import jax.lax

    qb = jnp.asarray(q).astype(jnp.bfloat16)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    dots_bf = np.asarray(
        jax.lax.dot_general(
            qb, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(np.float64)
    x_sq = (x.astype(np.float64) ** 2).sum(1)
    s_true = 2 * dots_true - x_sq[None, :]
    s_bf = 2 * dots_bf - x_sq[None, :]
    qn = np.linalg.norm(q, axis=1)
    xn = np.sqrt(x_sq)
    eps = (2.0 ** -6) * qn[:, None] * xn[None, :]
    assert (np.abs(s_bf - s_true) <= eps).all()


def test_certified_topk_k_larger_than_live(rng):
    from embeddinghub_tpu.ops import certified_topk_search

    n, d = 4096, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:3] = True
    q = np.concatenate([x[:1], np.zeros((7, d), np.float32)])
    dist, idx, _ = certified_topk_search(
        jnp.asarray(q),
        jnp.asarray(x),
        jnp.asarray(valid),
        sqnorms(jnp.asarray(x)),
        metric="l2",
        k=8,
    )
    dist = np.asarray(dist)[0]
    assert np.isfinite(dist[:3]).all()
    assert np.isinf(dist[3:]).all()
    assert (np.asarray(idx)[0][3:] == -1).all()


@pytest.mark.parametrize("metric", ["l2", "cosine"])
@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_quantized_chunked_recall(rng, metric, dtype):
    """Deep-scale chunked quantized scan: high recall vs the exact
    oracle, candidates merged correctly across chunks."""
    import ml_dtypes

    from embeddinghub_tpu.ops import quantized_chunked_search

    n, d, b, k = 4096, 32, 8, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = (x[rng.integers(0, n, b)]
         + 0.05 * rng.standard_normal((b, d))).astype(np.float32)
    valid = np.ones(n, bool)
    xp = np.asarray(preprocess_vectors(jnp.asarray(x), metric))
    x_sq = (xp * xp).sum(1).astype(np.float32)
    if dtype == "int8":
        scales = np.maximum(np.abs(xp).max(1) / 127.0, 1e-30).astype(np.float32)
        xq = np.clip(np.round(xp / scales[:, None]), -127, 127).astype(np.int8)
        sc = jnp.asarray(scales)
    else:
        xq = xp.astype(ml_dtypes.bfloat16)
        sc = None
    dist, idx = quantized_chunked_search(
        jnp.asarray(q),
        jnp.asarray(xq),
        sc,
        jnp.asarray(valid),
        jnp.asarray(x_sq),
        metric=metric,
        k=k,
        oversample=8,
        chunk=1024,  # 4 chunks
    )
    idx = np.asarray(idx)

    if metric == "l2":
        ref = np_l2(q, x)
    else:
        qa = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = 1.0 - qa @ xp.T
    oracle = np.argsort(ref, axis=1)[:, :k]
    recall = np.mean([
        len(set(idx[i]) & set(oracle[i])) / k for i in range(b)
    ])
    assert recall >= 0.9, recall
    # rerank distances come from the stored (quantized) rows: exact to
    # f32 for bf16... storage is bf16 rows, so allow quantization-level
    # error; int8 rows carry larger per-element rounding.
    tol = dict(rtol=0.05, atol=0.5) if dtype == "int8" else dict(
        rtol=2e-2, atol=0.15
    )
    np.testing.assert_allclose(
        np.take_along_axis(ref, idx, axis=1)[np.asarray(dist) < np.inf],
        np.asarray(dist)[np.asarray(dist) < np.inf],
        **tol,
    )


@pytest.mark.parametrize("metric", ["l2", "cosine"])
@pytest.mark.parametrize("dtype", ["int8", "int8x2", "bfloat16"])
def test_quantized_chunked_exact_and_split(rng, metric, dtype):
    """The fold-rerank-into-the-scan deep path (quantized_chunked_exact,
    the >16M replacement whose peak temps stay chunk-sized) and the
    id-only/device-rerank split pair must match the monolithic
    quantized_chunked_search's quality: same-or-better recall vs the
    exact oracle (the per-chunk exact pool is wider than the pooled kk),
    and the split's host rerank is exact f32."""
    import ml_dtypes

    from embeddinghub_tpu.ops import (
        quantized_chunked_exact,
        quantized_chunked_ids,
        quantized_pool_rerank,
    )
    from embeddinghub_tpu.ops.topk import host_rerank

    n, d, b, k = 4096, 32, 8, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = (x[rng.integers(0, n, b)]
         + 0.05 * rng.standard_normal((b, d))).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-64:] = False
    xp = np.asarray(preprocess_vectors(jnp.asarray(x), metric))
    x_sq = (xp * xp).sum(1).astype(np.float32)
    lo = None
    if dtype in ("int8", "int8x2"):
        scales = np.maximum(np.abs(xp).max(1) / 127.0, 1e-30).astype(np.float32)
        hi = np.clip(np.round(xp / scales[:, None]), -127, 127).astype(np.int8)
        if dtype == "int8x2":
            resid = xp / scales[:, None] - hi
            lo = jnp.asarray(
                np.clip(np.round(resid * 254.0), -127, 127).astype(np.int8)
            )
        xq = hi
        sc = jnp.asarray(scales)
    else:
        xq = xp.astype(ml_dtypes.bfloat16)
        sc = None
    args = (jnp.asarray(q), jnp.asarray(xq), sc, jnp.asarray(valid),
            jnp.asarray(x_sq))
    kw = dict(metric=metric, k=k, oversample=8, chunk=1024)

    if metric == "l2":
        ref = np_l2(q, x)
    else:
        qa = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = 1.0 - qa @ xp.T
    ref[:, ~valid] = np.inf
    oracle = np.argsort(ref, axis=1)[:, :k]

    def recall(ids):
        return np.mean([
            len(set(ids[i].tolist()) & set(oracle[i].tolist())) / k
            for i in range(b)
        ])

    dist_e, idx_e = quantized_chunked_exact(*args, lo, **kw)
    idx_e = np.asarray(idx_e)
    assert recall(idx_e) >= 0.9, recall(idx_e)
    assert not np.isin(idx_e, np.arange(n - 64, n)).any()  # invalid rows

    # split pair: device id pool -> device rerank AND host rerank
    cand = quantized_chunked_ids(*args, **kw)
    _, idx_dev = quantized_pool_rerank(
        jnp.asarray(q), jnp.asarray(xq), sc, jnp.asarray(x_sq), lo,
        cand, metric=metric, k=k)
    idx_dev = np.asarray(idx_dev)
    assert recall(idx_dev) >= 0.9, recall(idx_dev)
    _, idx_host = host_rerank(xp, valid, q, np.asarray(cand), k, metric)
    assert recall(idx_host) >= 0.9, recall(idx_host)
    # the host rerank scores the pool in exact f32: on the same pool it
    # can only improve on the device's dequantized ordering
    assert recall(idx_host) >= recall(idx_dev) - 1e-9


def test_heuristic_prune_matches_scan_greedy(rng):
    """The slot-loop heuristic (argmin over undominated per kept slot)
    must accept EXACTLY the same set as hnswlib's candidate-scan greedy
    (scan nearest-first, keep c iff d(c,q) < d(c,s) for every kept s)."""
    from embeddinghub_tpu.ops import nn_descent as nnd

    n, d, b, ck, mk = 600, 16, 64, 48, 8
    # small-integer vectors: every distance is an exact small integer in
    # f32 AND bf16, so the jax kernel's (bf16-truncating) matmuls agree
    # bit-for-bit with the numpy reference — the comparison tests the
    # ALGORITHM, not matmul rounding (ties break by pool position in
    # both: stable distance sort vs argmin-lowest-index)
    x = rng.integers(-4, 5, size=(n, d)).astype(np.float32)
    xd = jnp.asarray(x)
    xsq = jnp.einsum("nd,nd->n", xd, xd)
    pools = np.stack([
        rng.choice(n, ck, replace=False).astype(np.int32) for _ in range(b)
    ])
    # sprinkle -1 padding
    pools[rng.random((b, ck)) < 0.15] = -1
    q = x[:b]

    got = np.asarray(nnd.heuristic_prune(
        xd, xsq, jnp.asarray(pools), m_keep=mk, metric="l2", cand_k=ck,
        q=jnp.asarray(q), q_sq=jnp.einsum("bd,bd->b", q, q),
    ))

    def scan_greedy(cand, qv):
        cand = [c for c in cand if c >= 0]
        dq = {c: float(((x[c] - qv) ** 2).sum()) for c in cand}
        kept = []
        for c in sorted(cand, key=lambda c: dq[c]):
            if len(kept) >= mk:
                break
            if all(((x[c] - x[s]) ** 2).sum() >= dq[c] for s in kept):
                kept.append(c)
        return set(kept)

    for i in range(b):
        want = scan_greedy(pools[i].tolist(), q[i])
        have = set(int(v) for v in got[i] if v >= 0)
        assert have == want, (i, sorted(have), sorted(want))
