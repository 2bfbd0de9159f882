"""Fixed-width bit-packing for id readbacks over the wire.

The serving hot path reads back ONLY row ids (`with_distances=False`);
on the tunneled dev chip the wire is the scarce resource (CLAUDE.md:
~35 MB/s), and an int32 id spends 32 bits on a value that fits in
ceil(log2(cap+1)) bits — 17 bits at 100K rows, 23 at 8M.  Packing the
[B, K] id block into a dense bitstream on device before the transfer
cuts the readback bytes ~32/bits x for a few microseconds of VPU work.

Encoding: v = id + 1 (0 = the "-1 / no result" sentinel), little-endian
bit order within each 32-bit word, flat [n*bits/32] int32 word stream
(n padded to a multiple of 32 so the stream is word-aligned).  The
reference returns ids as proto int64s over loopback gRPC and never
optimizes this (embeddingstore/server.cc NearestNeighbor); this is a
TPU-/wire-first replacement, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bits_for(cap: int) -> int:
    """Bit width for ids in [-1, cap): stores id+1, so covers cap+1
    values."""
    return max(1, int(np.ceil(np.log2(cap + 2))))


@functools.partial(jax.jit, static_argnames=("bits",))
def pack_ids(ids: jax.Array, *, bits: int) -> jax.Array:
    """[n] int32 ids (>= -1) -> [ceil(n/32)*bits] int32 packed words.

    Works on the flattened id block; n is padded to a multiple of 32
    with sentinel (-1) entries so every ``bits``-wide value lands in
    whole words: 32 values * bits == bits words exactly.
    """
    n = ids.shape[0]
    n_pad = (-n) % 32
    v = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.full((n_pad,), -1, jnp.int32)]
    ) + 1  # 0 = sentinel
    # [N, bits] little-endian bit matrix -> [N*bits/32, 32] word rows
    bitmat = (v[:, None] >> jnp.arange(bits, dtype=jnp.int32)) & 1
    words = bitmat.reshape(-1, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    packed = (words.astype(jnp.uint32) * weights).sum(
        axis=1, dtype=jnp.uint32
    )
    return packed.astype(jnp.int32)


def unpack_ids(words: np.ndarray, n: int, *, bits: int) -> np.ndarray:
    """Host-side inverse of :func:`pack_ids`: [w] int32 -> [n] int64
    ids (with -1 sentinels restored)."""
    w = np.asarray(words, dtype=np.uint32)
    bitmat = (
        (w[:, None] >> np.arange(32, dtype=np.uint32)) & 1
    ).reshape(-1, bits)
    vals = (bitmat.astype(np.int64) << np.arange(bits, dtype=np.int64)).sum(
        axis=1
    )
    return vals[:n] - 1
