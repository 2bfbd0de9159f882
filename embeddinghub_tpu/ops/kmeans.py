"""Batched k-means on the MXU — the routing stage of cluster-routed
graph construction (index/hnsw._cluster_build_fwd).

The exact-scan HNSW build is O(n^2·d): past ~2M rows/chip the scan
FLOPs dominate wall-clock (RESULTS.md).  Sub-quadratic pools need a
spatial partition; on TPU the natural one is k-means, because every
stage is a dense matmul: Lloyd assignment is ``[n, d] x [d, k]``,
centroid update is a segment-sum, and the final routing (which clusters
a node's candidate pool scans) is a tiny ``[k, k]`` centroid kNN.

No reference analog (hnswlib builds sequentially, index.cc:20-37);
the pattern follows IVF-style GPU ANN builders, TPU-first: static
shapes, ``lax.scan`` chunking, bf16 score matmuls with f32 updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


@functools.partial(jax.jit, static_argnums=(2, 3))
def _lloyd(xs: jax.Array, cent0: jax.Array, iters: int, chunk: int):
    """Lloyd iterations on a (sample) arena ``xs [s, d]``.  Empty
    clusters keep their previous centroid (standard fallback)."""
    s, d = xs.shape
    k = cent0.shape[0]
    xs_sq = jnp.einsum("nd,nd->n", xs, xs)

    def assign(cent):
        def step(_, sl):
            xc = jax.lax.dynamic_slice_in_dim(xs, sl, chunk)
            dots = jnp.dot(
                xc.astype(jnp.bfloat16),
                cent.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            csq = jnp.einsum("kd,kd->k", cent, cent)
            scores = 2.0 * dots - csq[None, :]
            return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

        _, parts = jax.lax.scan(
            step, None, jnp.arange(0, s, chunk, dtype=jnp.int32)
        )
        return parts.reshape(-1)[:s]

    def body(_, cent):
        a = assign(cent)
        sums = jnp.zeros((k, d), jnp.float32).at[a].add(xs)
        cnts = jnp.zeros((k,), jnp.float32).at[a].add(1.0)
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        return jnp.where(cnts[:, None] > 0, new, cent)

    cent = jax.lax.fori_loop(0, iters, body, cent0)
    return cent, assign(cent)


def fit_kmeans(
    xd: jax.Array,
    k: int,
    *,
    iters: int = 8,
    sample: int = 1 << 18,
    seed: int = 0,
    chunk: int = 1 << 16,
    limit: int | None = None,
) -> jax.Array:
    """Centroids ``[k, d]`` fitted on a row sample (Lloyd's is
    insensitive to sampling at these sizes; fitting on all n rows would
    pay the full assignment matmul ``iters`` times for no routing
    gain).  ``limit`` restricts sampling to the first ``limit`` rows
    (padded arenas carry sentinel rows past n)."""
    n = xd.shape[0] if limit is None else min(limit, xd.shape[0])
    rng = np.random.default_rng(seed)
    if n > sample:
        idx = np.sort(rng.choice(n, size=sample, replace=False))
        xs = xd[jnp.asarray(idx)]
    else:
        xs = xd[:n]
    s = xs.shape[0]
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2
    init = jnp.asarray(
        np.sort(rng.choice(s, size=k, replace=False)), jnp.int32
    )
    cent, _ = _lloyd(xs, xs[init], iters, chunk)
    return cent


@functools.partial(jax.jit, static_argnums=(2,))
def _assign_full(xd: jax.Array, cent: jax.Array, chunk: int) -> jax.Array:
    n = xd.shape[0]
    csq = jnp.einsum("kd,kd->k", cent, cent)
    centb = cent.T.astype(jnp.bfloat16)

    def step(_, sl):
        xc = jax.lax.dynamic_slice_in_dim(xd, sl, chunk)
        dots = jnp.dot(
            xc.astype(jnp.bfloat16), centb,
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmax(2.0 * dots - csq[None, :], axis=1).astype(
            jnp.int32
        )

    _, parts = jax.lax.scan(
        step, None, jnp.arange(0, n, chunk, dtype=jnp.int32)
    )
    return parts.reshape(-1)[:n]


def assign_clusters(
    xd: jax.Array, cent: jax.Array, chunk: int = 1 << 16
) -> np.ndarray:
    """Nearest-centroid id per row, host-materialized (the build's block
    planner is host logic; n int32 over the wire is cheap)."""
    n = xd.shape[0]
    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2
    return np.asarray(_assign_full(xd, cent, chunk))


def probe_order(cent: jax.Array) -> np.ndarray:
    """``[k, k]`` centroid ids sorted by distance (row i = cluster i's
    probe order, self first) — which clusters a node's candidate pool
    scans."""
    c = np.asarray(cent, np.float32)
    d2 = (
        (c * c).sum(1)[:, None] - 2.0 * (c @ c.T) + (c * c).sum(1)[None, :]
    )
    return np.argsort(d2, axis=1, kind="stable").astype(np.int32)


@functools.partial(jax.jit, static_argnums=(4,))
def _margin_scan(xd, cent, assignd, probesd, chunk):
    n = xd.shape[0]
    csq = jnp.einsum("kd,kd->k", cent, cent)
    centb = cent.T.astype(jnp.bfloat16)
    p = probesd.shape[1]

    def step(_, sl):
        xc = jax.lax.dynamic_slice_in_dim(xd, sl, chunk)
        a = jax.lax.dynamic_slice_in_dim(assignd, sl, chunk)
        dots = jnp.dot(
            xc.astype(jnp.bfloat16), centb,
            preferred_element_type=jnp.float32,
        )
        d2 = csq[None, :] - 2.0 * dots  # monotone in L2 (xsq constant/row)
        d_own = jnp.take_along_axis(d2, a[:, None], axis=1)[:, 0]
        pr = probesd[a]  # [chunk, p] probed centroid ids per row
        rows = jnp.arange(chunk)[:, None]
        masked = d2
        for j in range(p):
            masked = masked.at[rows[:, 0], pr[:, j]].set(jnp.inf)
        return None, masked.min(axis=1) - d_own

    _, parts = jax.lax.scan(
        step, None, jnp.arange(0, n, chunk, dtype=jnp.int32)
    )
    return parts.reshape(-1)[:n]


def boundary_margins(
    xd: jax.Array,
    cent: jax.Array,
    assign: np.ndarray,
    probes: np.ndarray,
    limit: int | None = None,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """Per-row routing margin: distance to the nearest UNPROBED centroid
    minus distance to the own centroid.  Small margin = the row sits at
    the edge of its probed neighborhood, i.e. its cluster-routed
    candidate pool may have missed true neighbors — these are the rows
    boundary repair re-pools exactly (index/hnsw.cluster_boundary_rows).
    One chunked [n, k] MXU matmul; k ≈ n/cluster_target stays tiny."""
    n = xd.shape[0] if limit is None else min(limit, xd.shape[0])
    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2
    return np.asarray(
        _margin_scan(
            xd[:n],
            cent,
            jnp.asarray(assign[:n], jnp.int32),
            jnp.asarray(probes, jnp.int32),
            chunk,
        )
    )
