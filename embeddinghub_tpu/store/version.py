"""Version — an immutable-able embedding table.

TPU-native rebuild of reference ``embeddingstore/version.{h,cc}``:

  * ``set`` writes the host arena and marks the device shard dirty
    (``version.cc:47-56`` wrote RocksDB then hnswlib incrementally);
  * immutability is enforced at set (``version.cc:48``; error type
    ``version.h:52-67``);
  * the iterator yields a stable snapshot for Download / index rebuild
    (``iterator.cc:21-45``'s RocksDB snapshot scan);
  * nearest-neighbor self-exclusion for keyed queries follows
    ``server.cc:182-207`` (over-fetch k+1, drop self).

Unlike the reference there is no per-write RocksDB round trip: writes go
to the packed arena + an append-only WAL, and the ANN "index build" is
just the arena itself (FlatIndex) or a batched graph build (HNSW).
"""

from __future__ import annotations

import threading
from typing import Iterable, Iterator

import numpy as np

from embeddinghub_tpu.index.base import Index
from embeddinghub_tpu.index.flat import FlatIndex
from embeddinghub_tpu.store import errors
from embeddinghub_tpu.store.keymap import KeyMap


class Version:
    def __init__(
        self,
        space: str,
        name: str,
        dims: int,
        metric: str = "l2",
        index: Index | None = None,
        wal=None,
    ):
        self.space = space
        self.name = name
        self.dims = int(dims)
        self.metric = metric
        self.index = index if index is not None else FlatIndex(self.dims, metric)
        self.keymap = KeyMap()
        self.immutable = False
        self._wal = wal
        # Writers and batched searches synchronize here (the server and
        # the QueryBatcher share it; replaces the reference's global
        # RPC mutex with per-version granularity).
        self.lock = threading.RLock()

    # ------------------------------------------------------------------ write

    def set(self, key: str, vec) -> None:
        self.multiset([(key, vec)])

    def multiset(self, pairs: Iterable[tuple[str, "np.ndarray"]]) -> None:
        if self.immutable:
            raise errors.ImmutableVersionError(self.space, self.name)
        keys = []
        vecs = []
        for key, vec in pairs:
            v = np.asarray(vec, dtype=np.float32).ravel()
            if v.shape[0] != self.dims:
                raise errors.DimensionMismatchError(self.dims, v.shape[0])
            keys.append(str(key))
            vecs.append(v)
        if not keys:
            return
        if len(set(keys)) != len(keys):
            # Dedup keep-last: duplicate keys in one batch would map to
            # the same row twice, inflating index size counters and
            # (for HNSW) inserting duplicate neighbor entries in a wave.
            last = {k: i for i, k in enumerate(keys)}
            order = sorted(last.values())
            keys = [keys[i] for i in order]
            vecs = [vecs[i] for i in order]
        rows = self.keymap.assign_many(keys)
        mat = np.stack(vecs)
        self.index.add(rows, mat)
        if self._wal is not None:
            self._wal.append_many(keys, mat)

    def delete(self, key: str) -> None:
        """Extension beyond the reference surface (it only deletes whole
        spaces); kept because the index supports invalidation natively."""
        if self.immutable:
            raise errors.ImmutableVersionError(self.space, self.name)
        row = self.keymap.release(str(key))
        if row is None:
            raise errors.KeyNotFoundError(self.space, key)
        self.index.remove(np.asarray([row]))
        if self._wal is not None:
            self._wal.append_delete(str(key))

    def make_immutable(self) -> None:
        self.immutable = True
        if self._wal is not None:
            self._wal.append_freeze()
        # Freeze marks the load->serve transition — the one moment a
        # measured quantization audit is both cheap enough (one oracle
        # scan, amortized against the bulk load it follows) and early
        # enough (before any query is served from a degraded arena).
        # Opt-in: EMBEDDINGHUB_QUANT_AUDIT=freeze.
        from embeddinghub_tpu.utils.config import get_config

        if get_config().quant_audit == "freeze":
            self.audit_quantization(bar=get_config().quant_audit_bar)

    def audit_quantization(self, bar: float = 0.95, nq: int = 64) -> dict:
        """Measured post-ingest quantization audit: device recall vs an
        exact host oracle, escalating the arena dtype until ``bar``
        clears or escalation is impossible (index/flat.audit_and_escalate
        — the at-scale answer to the pool-containment regime the
        pre-upload sample guard cannot see).  Returns the audit report;
        a no-op ``{"audited": []}``-shaped report for engines without a
        quantized arena (graph/sharded indexes)."""
        with self.lock:
            fn = getattr(self.index, "audit_and_escalate", None)
            if fn is None or getattr(self.index, "storage_dtype", "float32") \
                    not in ("int8", "int8x2", "bfloat16"):
                return {"audited": [], "escalated": [], "fit_blocked": None}
            return fn(bar=bar, nq=nq)

    # ------------------------------------------------------------------- read

    def get(self, key: str) -> np.ndarray:
        row = self.keymap.row(str(key))
        if row is None:
            raise errors.KeyNotFoundError(self.space, str(key))
        return self.index.vector(row)

    def multiget(self, keys: Iterable[str]) -> list[np.ndarray]:
        return [self.get(k) for k in keys]

    def __contains__(self, key: str) -> bool:
        return str(key) in self.keymap

    @property
    def size(self) -> int:
        return len(self.keymap)

    def iterator(self) -> Iterator[tuple[str, np.ndarray]]:
        """Stable snapshot scan (keys fixed at call time)."""
        items = list(self.keymap.items())
        for key, row in items:
            yield key, self.index.vector(row)

    # ---------------------------------------------------------------- nearest

    def nearest(
        self, num: int, key: str | None = None, vector=None
    ) -> list[str]:
        """Reference-parity single query (``server.cc:172-210``)."""
        has_key = key is not None and key != ""
        has_vec = vector is not None and len(vector) != 0
        if has_key and has_vec:
            raise errors.InvalidArgumentError("Key and embedding cannot both be set")
        if not has_key and not has_vec:
            raise errors.InvalidArgumentError("Key or embedding must be set")
        if has_key:
            vector = self.get(key)
            fetch = num + 1
        else:
            vector = np.asarray(vector, dtype=np.float32)
            fetch = num
        keys = self.nearest_batch(vector[None, :], fetch)[0]
        if has_key:
            if str(key) in keys:
                keys.remove(str(key))
            elif len(keys) > num:
                keys.pop()
        return keys

    def nearest_batch(self, queries: np.ndarray, k: int) -> list[list[str]]:
        """Batched k-NN returning keys, nearest first.  This is the fused
        server path: many concurrent RPCs share one device dispatch."""
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.dims:
            raise errors.DimensionMismatchError(self.dims, queries.shape[-1])
        _, rows = self.index.search(queries, k)
        out: list[list[str]] = []
        for r in rows:
            keys = self.keymap.keys_for_rows(r[r >= 0])
            out.append([k for k in keys if k is not None])
        return out
