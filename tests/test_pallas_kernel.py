"""Pallas fused top-k kernel — interpreter-mode correctness on CPU.

(The compiled path is exercised on real TPU by bench.py and the flat
index's accelerator branch; interpret mode validates the kernel logic
in CI without hardware.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from embeddinghub_tpu.ops.pallas_topk import (
    fused_topk_search,
    fused_topk_search_v2,
)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_fused_matches_oracle(rng, metric):
    n, d, b, k = 512, 32, 16, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::7] = False
    xsq = (x * x).sum(1)
    dist, idx = fused_topk_search(
        jnp.asarray(q),
        jnp.asarray(x),
        jnp.asarray(valid),
        jnp.asarray(xsq),
        k=k,
        metric=metric,
        chunk=128,
        block_b=16,
        interpret=True,
    )
    dist, idx = np.asarray(dist), np.asarray(idx)
    if metric == "l2":
        ref = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    else:
        ref = 1.0 - q @ x.T
    ref[:, ~valid] = np.inf
    oracle = np.argsort(ref, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        dist, np.take_along_axis(ref, oracle, axis=1), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.take_along_axis(ref, idx, axis=1), dist, rtol=1e-3, atol=1e-3
    )
    assert not np.isin(idx, np.flatnonzero(~valid)).any()


def test_fused_k_exceeds_live(rng):
    n, d = 128, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:3] = True
    dist, idx = fused_topk_search(
        jnp.asarray(x[:8]),
        jnp.asarray(x),
        jnp.asarray(valid),
        jnp.asarray((x * x).sum(1)),
        k=8,
        metric="l2",
        chunk=128,
        block_b=8,
        interpret=True,
    )
    dist = np.asarray(dist)
    idx = np.asarray(idx)
    assert np.isfinite(dist[:, :3]).all()
    assert (idx[:, 3:] == -1).all()


def test_fused_shape_validation(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        fused_topk_search(
            jnp.asarray(x[:8]),
            jnp.asarray(x),
            jnp.ones(100, bool),
            jnp.zeros(100, jnp.float32),
            k=4,
            chunk=64,
            block_b=8,
            interpret=True,
        )


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_fused_v2_matches_oracle(rng, metric):
    """v2 keeps one winner per 128-column group; with k <= groups the
    oracle top-1 must always survive and overlap must be near-exact
    when the true top-k spread across groups (guaranteed here by
    checking overlap against a group-aware oracle)."""
    n, d, b, k = 1024, 32, 16, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::7] = False
    xsq = (x * x).sum(1)
    dist, idx = fused_topk_search_v2(
        jnp.asarray(q),
        jnp.asarray(x.T),
        jnp.asarray(valid),
        jnp.asarray(xsq),
        k=k,
        metric=metric,
        chunk=256,
        block_b=16,
        interpret=True,
    )
    dist, idx = np.asarray(dist), np.asarray(idx)
    if metric == "l2":
        ref = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    else:
        ref = 1.0 - q @ x.T
    ref[:, ~valid] = np.inf

    # group-aware oracle: best per 128-group, then top-k of those
    g = ref.reshape(b, n // 128, 128)
    gbest_off = np.argmin(g, axis=2)
    gbest = np.min(g, axis=2)
    order = np.argsort(gbest, axis=1, kind="stable")[:, :k]
    want_ids = order * 128 + np.take_along_axis(gbest_off, order, axis=1)
    # bf16 scoring can swap near-ties inside a group: compare true
    # scores of what was kept vs the oracle's picks (ranking-grade)
    got_sc = np.sort(np.take_along_axis(ref, idx, axis=1), axis=1)
    want_sc = np.sort(np.take_along_axis(ref, want_ids, axis=1), axis=1)
    np.testing.assert_allclose(got_sc, want_sc, rtol=3e-2, atol=3e-2)
    overlap = np.mean([
        len(set(idx[i]) & set(want_ids[i])) / k for i in range(b)
    ])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(
        np.take_along_axis(ref, idx, axis=1), dist, rtol=3e-2, atol=3e-2
    )
    # the global top-1 survives group reduction (ties aside)
    top1_sc = np.take_along_axis(ref, idx[:, :1], axis=1)[:, 0]
    np.testing.assert_allclose(top1_sc, ref.min(axis=1), rtol=3e-2, atol=3e-2)
    assert not np.isin(idx, np.flatnonzero(~valid)).any()


def test_fused_v2_bf16_arena(rng):
    """The HBM win: a bf16 pre-transposed arena is accepted directly."""
    n, d, b, k = 512, 16, 8, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    dist, idx = fused_topk_search_v2(
        jnp.asarray(q),
        jnp.asarray(x.T).astype(jnp.bfloat16),
        jnp.ones(n, bool),
        jnp.asarray((x * x).sum(1)),
        k=k,
        metric="l2",
        chunk=128,
        block_b=8,
        interpret=True,
    )
    idx = np.asarray(idx)
    assert (idx[:, 0] == np.arange(b)).all()


@pytest.mark.tpu
def test_fused_topk_real_lowering():
    """Real Mosaic lowering (interpret=False) — pinned on TPU hardware.

    Skipped on CPU (the default harness); run explicitly on the chip:
    ``python -m pytest tests/test_pallas_kernel.py -m tpu``."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU hardware")
    rng = np.random.default_rng(5)
    n, d, b, k = 8192, 128, 256, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones((n,), bool)
    x_sq = (x * x).sum(1)
    dist, ids = fused_topk_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid),
        jnp.asarray(x_sq), k=k, metric="l2", interpret=False,
    )
    ids = np.asarray(ids)
    # oracle
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = np.argsort(full, axis=1)[:, :k]
    overlap = np.mean([
        len(set(ids[i]) & set(want[i])) / k for i in range(b)
    ])
    assert overlap >= 0.99, overlap
