"""Batched pairwise distance kernels (MXU path).

The reference computes distances one query at a time inside hnswlib's
``searchKnn`` (scalar/SIMD L2 over ``float*``; reference:
``embeddinghub/embeddingstore/index.cc:39-52`` and hnswlib's
``L2Space``).  On TPU the FLOPs belong on the 128x128 systolic array, so
every distance evaluation here is a batched matmul:

    L2^2(q, x) = ||x||^2 - 2 q.x + ||q||^2

with ``||x||^2`` precomputed once per index and the ``q.x`` term a single
``[B, D] @ [D, N]`` contraction.  ``||q||^2`` is a rank-constant per row
and is omitted from ranking-only paths.

Distance conventions match the reference:
  * ``l2``     -> squared L2 (hnswlib returns squared distances)
  * ``ip``     -> 1 - q.x      (hnswlib InnerProductSpace convention)
  * ``cosine`` -> 1 - cos(q,x) (reference Redis vector path uses COSINE,
                  provider/redis.go:251-254; implemented by normalizing
                  at ingest like hnswlib's cosine wrapper)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

METRICS = ("l2", "ip", "cosine")


def _dot(q: jax.Array, xt: jax.Array, compute_dtype) -> jax.Array:
    """``[B, D] @ [D, N]`` on the MXU with f32 accumulation.

    When the caller asks for float32 inputs we also request HIGHEST
    precision so XLA does not silently truncate operands to bf16 (the
    TPU default); bf16/other dtypes take the fast native path.
    """
    cd = jnp.dtype(compute_dtype)
    precision = jax.lax.Precision.HIGHEST if cd == jnp.float32 else None
    return jnp.dot(
        q.astype(cd),
        xt.astype(cd),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def sqnorms(x: jax.Array) -> jax.Array:
    """Row squared norms ``||x_i||^2`` of an ``[N, D]`` matrix -> ``[N]``."""
    return jnp.einsum("nd,nd->n", x, x)


def preprocess_vectors(x: jax.Array, metric: str) -> jax.Array:
    """Ingest-time normalization. Cosine indexes store unit vectors so the
    query-time kernel is a plain dot product."""
    if metric == "cosine":
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-30)
    return x


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def pairwise_l2(
    q: jax.Array,
    x: jax.Array,
    x_sq: jax.Array | None = None,
    *,
    compute_dtype: jnp.dtype | str = jnp.float32,
) -> jax.Array:
    """Squared-L2 distances ``[B, N]`` between queries ``[B, D]`` and rows
    ``[N, D]``.  Includes the ``||q||^2`` term so values are true squared
    distances (needed when distances are user-visible, e.g. thresholding)."""
    if x_sq is None:
        x_sq = sqnorms(x)
    q_sq = sqnorms(q)
    dots = _dot(q, x.T, compute_dtype)
    d = x_sq[None, :] - 2.0 * dots + q_sq[:, None]
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def pairwise_ip(
    q: jax.Array,
    x: jax.Array,
    *,
    compute_dtype: jnp.dtype | str = jnp.float32,
) -> jax.Array:
    """Inner-product distance ``1 - q.x`` -> ``[B, N]``."""
    dots = _dot(q, x.T, compute_dtype)
    return 1.0 - dots


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def pairwise_cosine(
    q: jax.Array,
    x_unit: jax.Array,
    *,
    compute_dtype: jnp.dtype | str = jnp.float32,
) -> jax.Array:
    """Cosine distance ``1 - cos`` assuming index rows are pre-normalized
    (see :func:`preprocess_vectors`); queries are normalized here."""
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    return pairwise_ip(qn, x_unit, compute_dtype=compute_dtype)


def pairwise_dist(
    q: jax.Array,
    x: jax.Array,
    metric: str,
    x_sq: jax.Array | None = None,
    *,
    compute_dtype: jnp.dtype | str = jnp.float32,
) -> jax.Array:
    """Metric-dispatching batched distance. ``x`` must already be
    ingest-preprocessed for the metric (cosine -> unit rows)."""
    if metric == "l2":
        return pairwise_l2(q, x, x_sq, compute_dtype=compute_dtype)
    if metric == "ip":
        return pairwise_ip(q, x, compute_dtype=compute_dtype)
    if metric == "cosine":
        return pairwise_cosine(q, x, compute_dtype=compute_dtype)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")
