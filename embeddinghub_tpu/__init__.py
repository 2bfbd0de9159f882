"""embeddinghub_tpu — a TPU-native vector database + feature-store framework.

A ground-up rebuild of featureform/embeddinghub's capabilities designed for
TPU hardware:

- the embedding engine (reference: ``embeddinghub/embeddingstore/*.cc``) is
  rebuilt as JAX/XLA/Pallas kernels over packed HBM-resident vector shards,
- approximate/exact nearest-neighbor search runs as batched MXU matmuls with
  fused top-k selection instead of per-query scalar graph walks,
- multi-chip scale-out uses ``jax.sharding`` meshes + ICI collectives instead
  of a single-node RocksDB cache,
- the Python SDK and gRPC wire surface (``embedding_store.proto``) are kept
  compatible so reference users can switch without code changes.

Layout:
    ops/       batched distance + top-k kernels (JAX + Pallas)
    index/     index implementations: Flat (exact), IVF, HNSW (array-form)
    store/     Hub -> Space -> Version store semantics + persistence
    parallel/  device-mesh sharding: sharded search, ICI top-k merge
    service/   gRPC server (wire-compatible with the reference proto)
    sdk/       EmbeddingHubClient + offline Index (reference SDK parity)
    featurestore/  thin feature-store capability layer (registry, serving)
    utils/     config, logging, metrics
    native/    C++ runtime components (snapshot IO, arena storage)
"""

__version__ = "0.1.0"

from embeddinghub_tpu.utils.config import Config, get_config  # noqa: F401
