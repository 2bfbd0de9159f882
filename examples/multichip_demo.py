"""Multi-chip engines demo — runs on a virtual 8-device CPU mesh.

Shows the same store surface (`EmbeddingHub` -> Space -> Version)
backed by each mesh engine:

  * ``sharded``        — exact flat scan per shard + ICI all-gather merge
  * ``sharded-int8``   — quantized shard arenas (4x rows/chip)
  * ``hnsw-sharded``   — per-shard HNSW graphs, per-shard beam + merge

On real hardware the same code spans a TPU slice (the mesh comes from
``jax.devices()``); ``benchmarks/multihost_dryrun.py`` runs the same
search step across 2 ``jax.distributed`` processes.

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/multichip_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from embeddinghub_tpu.store import EmbeddingHub


def main():
    import jax

    print(f"mesh devices: {len(jax.devices())} ({jax.default_backend()})")
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((4096, 64)).astype(np.float32)

    for engine in ("sharded", "sharded-int8", "hnsw-sharded"):
        hub = EmbeddingHub.in_memory(engine=engine)
        hub.create_space("items", dims=64, metric="cosine")
        v = hub.get_version("items")
        v.multiset([(f"item-{i}", vecs[i]) for i in range(len(vecs))])
        got = v.nearest(3, key="item-42")
        self_hit = v.nearest(1, vector=vecs[777])
        print(f"{engine:14s} nearest(item-42) -> {got}  "
              f"self-lookup item-777 -> {self_hit}")
        assert self_hit == ["item-777"], (engine, self_hit)
    print("all mesh engines OK")


if __name__ == "__main__":
    main()
