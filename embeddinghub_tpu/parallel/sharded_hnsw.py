"""ShardedHNSWIndex — graph ANN over a device mesh.

Multi-chip scale-out of the graph engine (SURVEY.md §5: "per-shard beam
search, ICI all-gather top-k merge within a slice"; the reference scales
only by hnswlib capacity-doubling on one node, ``index.cc:29-31``).
Rows are sharded **round-robin** like :class:`ShardedFlatIndex` (host
row ``r`` -> shard ``r % S``, local ``r // S``); each shard owns an
independent array-form HNSW graph over its local rows (the faiss
IndexShards decomposition — per-shard recall matches a single graph of
``n/S`` rows, and the union of per-shard top-k contains the global
top-k whenever each shard's local search is exact over its subset).

Query path is SPMD via ``shard_map``: ONE dispatch runs, per shard,
the fused upper-layer greedy descent + layer-0 beam over the local
graph, then ``lax.all_gather`` moves only the tiny ``[B, k]``
candidate lists over ICI and a replicated merge picks the global
top-k.  No host round trips inside the hot path.

Builds are embarrassingly parallel across shards (each shard's bulk
build / streamed waves are the single-chip paths of
:class:`~embeddinghub_tpu.index.hnsw.HNSWIndex`); on a real pod each
host builds its own shard.  The stacked search state is re-uploaded
with a sharded ``device_put`` when any shard's graph changes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from embeddinghub_tpu.index.base import Index, as_f32_matrix, next_pow2
from embeddinghub_tpu.index.flat import _bucket
from embeddinghub_tpu.index.hnsw import HNSWIndex
from embeddinghub_tpu.ops import beam as beam_ops
from embeddinghub_tpu.ops import distance as dist_ops
from embeddinghub_tpu.parallel.mesh import SHARD_AXIS, default_mesh


class ShardedHNSWIndex(Index):
    def __init__(
        self,
        dims: int,
        metric: str = "l2",
        mesh: Mesh | None = None,
        m: int = 16,
        ef_construction: int = 200,
        ef_search: int = 10,
        capacity: int = 1024,
        seed: int = 0,
    ):
        if metric not in dist_ops.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        self.dims = int(dims)
        self.metric = metric
        self.m = int(m)
        self.ef_search = int(ef_search)
        self.mesh = mesh if mesh is not None else default_mesh()
        self.n_shards = self.mesh.devices.size
        cap_l = next_pow2(
            -(-max(capacity, 128) // self.n_shards), floor=128
        )
        self._shards = [
            HNSWIndex(
                dims,
                metric=metric,
                m=m,
                ef_construction=ef_construction,
                ef_search=ef_search,
                capacity=cap_l,
                seed=seed + 1000 * s,
            )
            for s in range(self.n_shards)
        ]
        self._stacked = None       # sharded device arrays for search
        self._search_fns = {}      # (ef_l, kk, shapes-key) -> jitted fn

    # ------------------------------------------------------------------ write

    def add(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        vecs = as_f32_matrix(vecs, self.dims)
        if rows.shape[0] != vecs.shape[0]:
            raise ValueError("rows / vecs length mismatch")
        if rows.size == 0:
            return
        s = self.n_shards
        for j in range(s):
            mask = (rows % s) == j
            if mask.any():
                self._shards[j].add(rows[mask] // s, vecs[mask])
        self._stacked = None

    def remove(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        s = self.n_shards
        for j in range(s):
            mask = (rows % s) == j
            if mask.any():
                self._shards[j].remove(rows[mask] // s)
        self._stacked = None

    @property
    def size(self) -> int:
        return sum(sh.size for sh in self._shards)

    @property
    def total_capacity(self) -> int:
        return max(sh._cap for sh in self._shards) * self.n_shards

    def vector(self, row: int) -> np.ndarray:
        return self._shards[row % self.n_shards].vector(row // self.n_shards)

    def vectors(self, rows: np.ndarray) -> np.ndarray:
        rows = np.asarray(rows, dtype=np.int64)
        return np.stack([self.vector(int(r)) for r in rows])

    # ------------------------------------------------------------------ stack

    def _stack(self):
        """Gather every shard's graph state into [S, ...] arrays laid out
        over the mesh's shard axis (one shard's slab per device)."""
        if self._stacked is not None:
            return self._stacked
        s = self.n_shards
        states = []
        for sh in self._shards:
            if sh.size > 0:
                states.append(sh._device_arrays())
            else:
                states.append(None)
        cap_l = max(sh._cap for sh in self._shards)
        lmax = max(
            (int(st["ustack"].shape[0]) for st in states if st is not None),
            default=0,
        )
        d = self.dims
        # widths come from the SHARDS (a from_state wrapper may have been
        # constructed before the restored shards' m was known)
        m0_w = max(sh.m0 for sh in self._shards)
        m_w = max(sh.m for sh in self._shards)
        x = np.zeros((s, cap_l, d), np.float32)
        x_sq = np.zeros((s, cap_l), np.float32)
        valid = np.zeros((s, cap_l), bool)
        nb0 = np.full((s, cap_l, m0_w), -1, np.int32)
        ustack = np.full((s, max(lmax, 1), cap_l, m_w), -1, np.int32)
        entry = np.zeros((s,), np.int32)
        for j, st in enumerate(states):
            if st is None:
                continue
            xs = np.asarray(st["x"])
            x[j, : xs.shape[0]] = xs
            x_sq[j, : xs.shape[0]] = np.asarray(st["x_sq"])
            valid[j, : xs.shape[0]] = np.asarray(st["valid"])
            nb = np.asarray(st["nb0"])
            nb0[j, : nb.shape[0], : nb.shape[1]] = nb
            us = np.asarray(st["ustack"])
            if us.shape[0]:
                ustack[j, : us.shape[0], : us.shape[1], : us.shape[2]] = us
            entry[j] = max(self._shards[j]._entry, 0)
            # release the shard's UNSHARDED device copy: it lives on the
            # default device, so keeping it alongside the stacked slabs
            # would park ~the whole index twice on chip 0 at scale
            self._shards[j]._sync_host()
            self._shards[j]._invalidate_device()

        shard1 = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._stacked = {
            "x": jax.device_put(x, shard1),
            "x_sq": jax.device_put(x_sq, shard1),
            "valid": jax.device_put(valid, shard1),
            "nb0": jax.device_put(nb0, shard1),
            "ustack": jax.device_put(ustack, shard1),
            "entry": jax.device_put(entry, shard1),
            "lmax": lmax,
            "cap_l": cap_l,
        }
        return self._stacked

    # ----------------------------------------------------------------- search

    def _build_search(self, ef_l: int, kk: int, lmax: int):
        mesh = self.mesh
        metric = self.metric
        n_shards = self.n_shards
        expand = self._shards[0].expand
        max_hops = 2 * ef_l + 64

        def local_search(q, entry, nb0, ustack, x, x_sq, valid):
            # block shapes: q [B, D] replicated; entry [1]; nb0
            # [1, capL, m0]; ustack [1, L, capL, m]; x [1, capL, D]
            nb0, ustack = nb0[0], ustack[0]
            x, x_sq, valid = x[0], x_sq[0], valid[0]
            b = q.shape[0]
            cur = jnp.full((b,), entry[0], jnp.int32)
            for layer in range(lmax, 0, -1):
                cur = beam_ops.greedy_descend(
                    q, cur, ustack[layer - 1], x, x_sq, metric=metric,
                )
            dl, il = beam_ops.beam_search(
                q, cur, nb0, x, x_sq, valid,
                metric=metric, ef=ef_l, expand=min(expand, ef_l),
                max_hops=max_hops,
            )
            dl, il = dl[:, :kk], il[:, :kk]
            shard = jax.lax.axis_index(SHARD_AXIS)
            ih = jnp.where(il >= 0, il * n_shards + shard, -1)
            # ICI all-gather of the tiny per-shard candidate lists
            dg = jax.lax.all_gather(dl, SHARD_AXIS)   # [S, B, kk]
            ig = jax.lax.all_gather(ih, SHARD_AXIS)
            dd = jnp.transpose(dg, (1, 0, 2)).reshape(b, n_shards * kk)
            ii = jnp.transpose(ig, (1, 0, 2)).reshape(b, n_shards * kk)
            dd = jnp.where(ii >= 0, dd, jnp.inf)
            nd, pos = jax.lax.top_k(-dd, kk)
            return -nd, jnp.take_along_axis(ii, pos, axis=1)

        fn = shard_map(
            local_search,
            mesh=mesh,
            in_specs=(
                P(None, None), P(SHARD_AXIS), P(SHARD_AXIS, None, None),
                P(SHARD_AXIS, None, None, None), P(SHARD_AXIS, None, None),
                P(SHARD_AXIS, None), P(SHARD_AXIS, None),
            ),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(
        self, queries: np.ndarray, k: int, ef: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = as_f32_matrix(queries, self.dims)
        b = queries.shape[0]
        if self.size == 0 or k <= 0:
            return (
                np.full((b, max(k, 0)), np.inf, np.float32),
                np.full((b, max(k, 0)), -1, np.int64),
            )
        ef = max(ef or self.ef_search, k)
        ef_l = min(next_pow2(ef, floor=8), 1024)
        st = self._stack()
        kk = min(next_pow2(k, floor=1), ef_l)
        pb = _bucket(b)
        q = np.zeros((pb, self.dims), np.float32)
        if self.metric == "cosine":
            n = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(n, 1e-30)
        q[:b] = queries
        key = (ef_l, kk, st["lmax"], st["cap_l"])
        fn = self._search_fns.get(key)
        if fn is None:
            fn = self._build_search(ef_l, kk, st["lmax"])
            self._search_fns[key] = fn
        d, i = fn(
            jnp.asarray(q), st["entry"], st["nb0"], st["ustack"],
            st["x"], st["x_sq"], st["valid"],
        )
        d = np.asarray(d)[:b, :k]
        i = np.asarray(i)[:b, :k].astype(np.int64)
        i[~np.isfinite(d)] = -1
        return d, i

    # -------------------------------------------------------------- snapshot

    def state_arrays(self) -> dict[str, np.ndarray]:
        out = {"nshards": np.asarray([self.n_shards], np.int32)}
        for j, sh in enumerate(self._shards):
            for name, arr in sh.state_arrays().items():
                out[f"s{j}.{name}"] = arr
        return out

    @classmethod
    def from_state(
        cls, dims: int, metric: str, arrays: dict[str, np.ndarray], **kw
    ) -> "ShardedHNSWIndex":
        s = int(arrays["nshards"][0])
        idx = cls(dims, metric=metric, **kw)
        if idx.n_shards != s:
            raise ValueError(
                f"snapshot has {s} shards, mesh has {idx.n_shards}"
            )
        for j in range(s):
            sub = {
                name[len(f"s{j}."):]: arr
                for name, arr in arrays.items()
                if name.startswith(f"s{j}.")
            }
            idx._shards[j] = HNSWIndex.from_state(dims, metric, sub)
        idx.m = idx._shards[0].m
        idx.ef_search = idx._shards[0].ef_search
        idx._stacked = None
        return idx
