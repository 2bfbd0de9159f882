"""Environment-driven configuration.

Mirrors the reference's env-var config style (reference:
``main/main.go:59-66`` / ``config/config.go``) with typed accessors.
The engine itself has a single required knob — the listen address — like
the reference binary (``embeddinghub/embeddingstore/main.cc:8``).
"""

from __future__ import annotations

import dataclasses
import os


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


@dataclasses.dataclass
class Config:
    """Process-wide configuration, resolved from environment variables."""

    # Service surface (reference default port: main.cc:8 -> 0.0.0.0:7462)
    host: str = "0.0.0.0"
    port: int = 7462
    data_dir: str = "embedding_store.dat"

    # Engine knobs
    engine: str = "flat"                # "flat" | "flat-bf16" | "flat-int8" |
                                        # "flat-int8x2" | "sharded" | "hnsw"
    default_metric: str = "l2"          # "l2" | "cosine" | "ip"
    compute_dtype: str = "float32"      # matmul input dtype on device
    query_batch_window_ms: float = 2.0  # server-side batching window
    max_query_batch: int = 1024

    # Index defaults — hnswlib-equal anchors (reference index.cc:10-15,
    # pinned hnswlib 21b54fe defaults: M=16, efConstruction=200, ef=10).
    hnsw_m: int = 16
    hnsw_ef_construction: int = 200
    hnsw_ef_search: int = 10
    # >0 enables centroid-routed multi-entry search once an index
    # first exceeds hnsw_route_min rows (HNSWIndex.build_route — no
    # hnswlib analog; the [B, K] routing matmul is ~free on the MXU)
    hnsw_seed_probes: int = 0
    hnsw_route_min: int = 1 << 20
    initial_capacity: int = 128         # reference index.h:21, doubles on growth

    # Measured post-ingest quantization audit (FlatIndex.audit_and_
    # escalate): "freeze" runs it when a version is made immutable —
    # the load->serve transition — escalating the arena dtype until
    # device recall (vs an exact host oracle) clears quant_audit_bar.
    quant_audit: str = "off"            # "off" | "freeze"
    quant_audit_bar: float = 0.95

    # Sharding
    mesh_axis: str = "shard"

    @staticmethod
    def from_env() -> "Config":
        return Config(
            host=_env("EMBEDDINGHUB_HOST", "0.0.0.0"),
            port=_env_int("EMBEDDINGHUB_PORT", 7462),
            data_dir=_env("EMBEDDINGHUB_DATA_DIR", "embedding_store.dat"),
            engine=_env("EMBEDDINGHUB_ENGINE", "flat"),
            default_metric=_env("EMBEDDINGHUB_METRIC", "l2"),
            compute_dtype=_env("EMBEDDINGHUB_COMPUTE_DTYPE", "float32"),
            query_batch_window_ms=float(_env("EMBEDDINGHUB_BATCH_WINDOW_MS", "2.0")),
            max_query_batch=_env_int("EMBEDDINGHUB_MAX_BATCH", 1024),
            hnsw_m=_env_int("EMBEDDINGHUB_HNSW_M", 16),
            hnsw_ef_construction=_env_int("EMBEDDINGHUB_HNSW_EFC", 200),
            hnsw_ef_search=_env_int("EMBEDDINGHUB_HNSW_EF", 10),
            hnsw_seed_probes=_env_int("EMBEDDINGHUB_HNSW_SEED_PROBES", 0),
            hnsw_route_min=_env_int("EMBEDDINGHUB_HNSW_ROUTE_MIN", 1 << 20),
            initial_capacity=_env_int("EMBEDDINGHUB_INIT_CAP", 128),
            quant_audit=_env("EMBEDDINGHUB_QUANT_AUDIT", "off"),
            quant_audit_bar=float(
                _env("EMBEDDINGHUB_QUANT_AUDIT_BAR", "0.95")
            ),
        )


_config: Config | None = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config
