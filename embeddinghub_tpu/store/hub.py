"""EmbeddingHub — the store root.

Rebuild of reference ``embeddingstore/embedding_store.{h,cc}``:
``load_or_create(path)`` + space registry.  Metadata rows (the
reference's ``SpaceEntry`` protos in a RocksDB at ``<path>/metadata``,
``embedding_store.cc:17-44``) become a single json manifest; space data
lives under ``<path>/<space>/``.

Reference-parity behaviors kept:
  * ``create_space`` is idempotent when the space is already loaded
    (``embedding_store.cc:33-36``);
  * ``delete_space`` drops the registry row and cached object
    (``embedding_store.cc:64-70``).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from pathlib import Path

from embeddinghub_tpu.store.space import DEFAULT_VERSION, Space


class EmbeddingHub:
    """``engine`` selects the default index implementation for new
    spaces: ``"flat"`` (exact single-chip), ``"flat-bf16"`` /
    ``"flat-int8"`` / ``"flat-int8x2"`` (quantized arenas — 2x / 4x /
    2x HBM capacity; int8x2 keeps an int8 residual plane so its rerank
    resolves dense near-duplicate data, see index/flat.py), ``"sharded"``
    (row-sharded over a device mesh with ICI top-k merge), ``"hnsw"``
    (array-form graph, hnswlib-parity), or ``"hnsw-sharded"`` (per-shard
    graphs over the mesh, per-shard beam + ICI all-gather merge)."""

    def __init__(
        self,
        base_path: str | Path | None = None,
        engine: str = "flat",
        mesh=None,
    ):
        self.base_path = Path(base_path) if base_path is not None else None
        self.engine = engine
        self.mesh = mesh
        self._spaces: dict[str, Space] = {}
        self._lock = threading.RLock()
        if self.base_path is not None:
            self.base_path.mkdir(parents=True, exist_ok=True)
            self._load_manifest()

    @classmethod
    def load_or_create(cls, path: str | Path, **kw) -> "EmbeddingHub":
        return cls(path, **kw)

    @classmethod
    def in_memory(cls, **kw) -> "EmbeddingHub":
        return cls(None, **kw)

    _QUANTIZED = {
        "flat-bf16": "bfloat16",
        "flat-int8": "int8",
        "flat-int8x2": "int8x2",
    }

    def _make_index(self, dims: int, metric: str):
        if self.engine == "flat":
            return None  # Version defaults to FlatIndex
        if self.engine in self._QUANTIZED:
            from embeddinghub_tpu.index.flat import FlatIndex

            return FlatIndex(
                dims, metric=metric,
                storage_dtype=self._QUANTIZED[self.engine],
            )
        if self.engine in ("sharded", "sharded-int8", "sharded-int8x2"):
            from embeddinghub_tpu.parallel.sharded_flat import ShardedFlatIndex

            sd = {"sharded": "float32", "sharded-int8": "int8",
                  "sharded-int8x2": "int8x2"}[self.engine]
            return ShardedFlatIndex(
                dims, metric=metric, mesh=self.mesh, storage_dtype=sd,
            )
        if self.engine == "hnsw":
            from embeddinghub_tpu.index.hnsw import HNSWIndex
            from embeddinghub_tpu.utils.config import get_config

            cfg = get_config()
            idx = HNSWIndex(
                dims,
                metric=metric,
                m=cfg.hnsw_m,
                ef_construction=cfg.hnsw_ef_construction,
                ef_search=cfg.hnsw_ef_search,
            )
            # opt-in centroid-routed multi-entry search at scale
            idx.auto_seed_probes = cfg.hnsw_seed_probes
            idx.auto_route_min = cfg.hnsw_route_min
            return idx
        if self.engine == "hnsw-sharded":
            from embeddinghub_tpu.parallel.sharded_hnsw import (
                ShardedHNSWIndex,
            )
            from embeddinghub_tpu.utils.config import get_config

            cfg = get_config()
            return ShardedHNSWIndex(
                dims,
                metric=metric,
                mesh=self.mesh,
                m=cfg.hnsw_m,
                ef_construction=cfg.hnsw_ef_construction,
                ef_search=cfg.hnsw_ef_search,
            )
        raise ValueError(f"unknown engine {self.engine!r}")

    # ----------------------------------------------------------------- spaces

    def create_space(
        self, name: str, dims: int, metric: str = "l2"
    ) -> Space:
        """Create a space with its default "initial" version (the server
        wires dims into the implicit version, ``server.cc:46-48``)."""
        name = str(name)
        with self._lock:
            if name in self._spaces:
                return self._spaces[name]
            path = self.base_path / name if self.base_path is not None else None
            space = Space(name, path)
            space.create_version(
                DEFAULT_VERSION, dims, metric, index=self._make_index(dims, metric)
            )
            self._spaces[name] = space
            self._save_manifest()
            return space

    def get_space(self, name: str) -> Space | None:
        with self._lock:
            return self._spaces.get(str(name))

    def delete_space(self, name: str) -> None:
        name = str(name)
        with self._lock:
            self._spaces.pop(name, None)
            if self.base_path is not None:
                shutil.rmtree(self.base_path / name, ignore_errors=True)
            self._save_manifest()

    def spaces(self) -> list[str]:
        with self._lock:
            return list(self._spaces)

    def get_version(self, space_name: str, version_name: str = DEFAULT_VERSION):
        """The server's resolve helper (``server.cc:235-242``)."""
        space = self.get_space(space_name)
        if space is None:
            return None
        return space.get_version(version_name)

    # ------------------------------------------------------------ persistence

    def save(self) -> None:
        """Snapshot every space (subsumes + truncates WALs)."""
        with self._lock:
            for space in self._spaces.values():
                space.save()
            self._save_manifest()

    def _manifest_path(self) -> Path:
        return self.base_path / "manifest.json"

    def _save_manifest(self) -> None:
        if self.base_path is None:
            return
        manifest = {
            "spaces": {
                name: {"path": str(self.base_path / name), "name": name}
                for name in self._spaces
            }
        }
        tmp = self._manifest_path().with_suffix(".tmp")
        tmp.write_text(json.dumps(manifest))
        os.replace(tmp, self._manifest_path())

    def _load_manifest(self) -> None:
        mp = self._manifest_path()
        if not mp.exists():
            return
        manifest = json.loads(mp.read_text())
        for name, entry in manifest.get("spaces", {}).items():
            self._spaces[name] = Space.load(name, entry["path"])
