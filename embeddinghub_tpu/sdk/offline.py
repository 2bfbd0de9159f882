"""Offline (in-process) index.

API-parity rebuild of reference ``sdk/python/offlinehub.py``: the same
``Index`` surface (``set``/``get``/``multiset``/``multiget``/
``nearest_neighbor``/``size``) for local training workflows, but backed
by the TPU FlatIndex instead of a local hnswlib graph — so batched
lookups run on-device and results are exact.

Example::

    client = EmbeddingHubClient()
    offline = Index(client.download("space"), dims)
    offline.nearest_neighbor(5, key="a")
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np

from embeddinghub_tpu.index.flat import FlatIndex
from embeddinghub_tpu.store.keymap import KeyMap


class Index:
    def __init__(self, key_emb_iter, dims: int, metric: str = "l2"):
        self._dims = int(dims)
        self._idx = FlatIndex(self._dims, metric=metric, capacity=1024)
        self._mapper = KeyMap()
        self.multiset(key_emb_iter)

    def set(self, key, embedding) -> None:
        """Insert or overwrite one embedding."""
        self.multiset([(key, embedding)])

    def multiset(self, embedding_tuples) -> None:
        """Bulk insert from a mapping or (key, embedding) iterable — one
        batched device scatter for the whole set."""
        if isinstance(embedding_tuples, Mapping):
            embedding_tuples = embedding_tuples.items()
        keys, vecs = [], []
        for key, embedding in embedding_tuples:
            keys.append(key)
            vecs.append(np.asarray(embedding, dtype=np.float32))
        if not keys:
            return
        rows = np.fromiter(
            (self._mapper.assign(k) for k in keys), dtype=np.int64, count=len(keys)
        )
        self._idx.add(rows, np.stack(vecs))

    def get(self, key):
        """The stored embedding for ``key`` (KeyError if absent)."""
        row = self._mapper.row(key)
        if row is None:
            raise KeyError(key)
        return self._idx.vector(row)

    def multiget(self, keys):
        return [self.get(k) for k in keys]

    def nearest_neighbor(self, num, key=None, embedding=None):
        """``num`` nearest neighbors; keyed queries exclude the key itself
        (reference semantics, ``offlinehub.py:113-131``)."""
        has_key = key is not None
        if has_key:
            embedding = self.get(key)
            fetch = num + 1
        else:
            fetch = num
        q = np.asarray(embedding, np.float32)[None, :]
        _, rows = self._idx.search(q, fetch)
        results = [
            self._mapper.key(int(r)) for r in rows[0] if r >= 0
        ]
        if has_key:
            if key in results:
                results.remove(key)
            elif len(results) > num:
                results.pop()
        return results

    def nearest_neighbor_batch(self, num, embeddings) -> list[list]:
        """Batched extension (no reference analog): one device dispatch
        for many queries."""
        q = np.asarray(embeddings, np.float32)
        _, rows = self._idx.search(q, num)
        return [
            [self._mapper.key(int(r)) for r in row if r >= 0] for row in rows
        ]

    def size(self) -> int:
        """Number of embeddings in the index."""
        return len(self._mapper)
