"""Device-mesh helpers.

The reference scales only by hnswlib capacity-doubling on one node
(SURVEY.md §2c); its cross-process fabric is gRPC.  Here scale-out is a
``jax.sharding.Mesh``: index rows are sharded round-robin across chips,
queries are replicated, and the per-shard top-k results meet in an ICI
all-gather merge (the "chunked materialization" analog for serving).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def shard_axis() -> str:
    return SHARD_AXIS


def default_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (SHARD_AXIS,))
