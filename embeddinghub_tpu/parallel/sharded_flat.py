"""ShardedFlatIndex — exact k-NN over a device mesh.

Multi-chip scale-out of :class:`FlatIndex` (SURVEY.md §7 step 5 /
BASELINE configs 4-5).  Index rows are sharded **round-robin** across
the mesh's ``shard`` axis: host row ``r`` lives on shard ``r % S`` at
local position ``r // S``, so sequentially-allocated keys stay balanced
and batched inserts route to all shards evenly.

Search is SPMD via ``shard_map``:

    per shard:  streaming fused distance+top-k over the local rows
                (the same chunked kernel as single-chip)
    merge:      ``lax.all_gather`` of the [B, k] candidates over ICI
                (tiny: B*k floats+ids), then a replicated top-k merge

The all-gather rides ICI; no host round trips in the hot path.  Writes
mirror FlatIndex: host-authoritative arena, device shards rebuilt by a
sharded device_put (scatter fast-path for small dirty sets later).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from embeddinghub_tpu.index.base import (
    Index,
    as_f32_matrix,
    next_pow2,
    quantize_rows,
)
from embeddinghub_tpu.index.flat import _bucket
from embeddinghub_tpu.ops import distance as dist_ops
from embeddinghub_tpu.ops import topk as topk_ops
from embeddinghub_tpu.parallel.mesh import SHARD_AXIS, default_mesh


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _sharded_scatter(x, x_sq, valid, rows, vecs, vecs_sq, valid_bits):
    x = x.at[rows].set(vecs)
    x_sq = x_sq.at[rows].set(vecs_sq)
    valid = valid.at[rows].set(valid_bits)
    return x, x_sq, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _sharded_scatter_q(
    xq, scales, x_sq, valid, rows, qrows, row_scales, vecs_sq, valid_bits
):
    xq = xq.at[rows].set(qrows)
    scales = scales.at[rows].set(row_scales)
    x_sq = x_sq.at[rows].set(vecs_sq)
    valid = valid.at[rows].set(valid_bits)
    return xq, scales, x_sq, valid


class ShardedFlatIndex(Index):
    def __init__(
        self,
        dims: int,
        metric: str = "l2",
        mesh: Mesh | None = None,
        capacity: int = 1024,
        chunk_target: int = 16384,
        compute_dtype: str = "float32",
        storage_dtype: str = "float32",
        quant_guard: bool = True,
    ):
        """``storage_dtype="int8"`` keeps each shard's arena quantized
        (per-row symmetric scales, int8 x int8 -> int32 MXU scoring with
        an f32 rerank of the pooled candidates — same scheme as the
        single-chip ``FlatIndex``): 4x rows per chip, the multi-chip
        Deep-scale capacity lever (BASELINE config 5).  ``"int8x2"``
        adds an int8 residual plane (x ≈ scale·(hi + lo/254), ~int15
        rerank resolution at 2 B/elem) for dense near-duplicate data
        where plain-int8 score gaps drown in quantization noise — see
        ``index/flat.py``."""
        if metric not in dist_ops.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        if storage_dtype not in ("float32", "int8", "int8x2"):
            raise ValueError(f"unsupported storage_dtype {storage_dtype!r}")
        self.dims = int(dims)
        self.metric = metric
        self.compute_dtype = compute_dtype
        self.storage_dtype = storage_dtype
        self.mesh = mesh if mesh is not None else default_mesh()
        self.n_shards = self.mesh.devices.size
        self._chunk_target = chunk_target
        # capacity is per-shard rows * n_shards; keep per-shard pow2 >= 128
        per_shard = next_pow2(-(-max(capacity, 128) // self.n_shards), floor=128)
        self._cap_local = per_shard
        self._hx = np.zeros((self.total_capacity, self.dims), dtype=np.float32)
        self._hvalid = np.zeros((self.total_capacity,), dtype=bool)
        self._size = 0
        self._dx = None
        self._dx_sq = None
        self._dvalid = None
        self._dscales = None
        self._dx_lo = None
        self._dirty = True
        self._dirty_rows: set[int] = set()
        self._search_fn = None
        self._search_k = None
        # quantization-regime guard (index/flat.apply_quant_guard):
        # int8 -> int8x2 -> float32 when sampled recall collapses
        self.quant_guard = bool(quant_guard)
        self._guard_checked_size = 0

    # ------------------------------------------------------------ properties

    @property
    def total_capacity(self) -> int:
        return self._cap_local * self.n_shards

    @property
    def size(self) -> int:
        return self._size

    # ------------------------------------------------------------------ write

    def add(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        vecs = as_f32_matrix(vecs, self.dims)
        if rows.shape[0] != vecs.shape[0]:
            raise ValueError("rows / vecs length mismatch")
        if rows.size == 0:
            return
        self._ensure_capacity(int(rows.max()) + 1)
        newly = ~self._hvalid[rows]
        self._size += int(np.count_nonzero(newly))
        self._hx[rows] = vecs
        self._hvalid[rows] = True
        self._mark_dirty(rows)

    def remove(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        rows = rows[(rows >= 0) & (rows < self.total_capacity)]
        self._size -= int(np.count_nonzero(self._hvalid[rows]))
        self._hvalid[rows] = False
        self._mark_dirty(rows)

    def _mark_dirty(self, rows: np.ndarray) -> None:
        """Track rows for the streaming-insert scatter path; large dirty
        sets degrade to a full re-upload."""
        if self._dirty:
            return
        self._dirty_rows.update(int(r) for r in rows)
        if len(self._dirty_rows) > 0.25 * self.total_capacity:
            self._dirty = True
            self._dirty_rows.clear()

    def _ensure_capacity(self, need: int) -> None:
        if need <= self.total_capacity:
            return
        new_local = next_pow2(-(-need // self.n_shards), floor=self._cap_local)
        old_cap = self.total_capacity
        self._cap_local = new_local
        grown_x = np.zeros((self.total_capacity, self.dims), dtype=np.float32)
        grown_x[:old_cap] = self._hx
        grown_v = np.zeros((self.total_capacity,), dtype=bool)
        grown_v[:old_cap] = self._hvalid
        self._hx, self._hvalid = grown_x, grown_v
        self._dirty = True

    # ------------------------------------------------------------------- sync

    def _shard_major(self, arr: np.ndarray) -> np.ndarray:
        """Reorder host (round-robin) rows into shard-contiguous order:
        host row r = local*S + shard  ->  device row shard*capL + local."""
        s, capl = self.n_shards, self._cap_local
        if arr.ndim == 2:
            return np.ascontiguousarray(
                arr.reshape(capl, s, arr.shape[1]).transpose(1, 0, 2)
            ).reshape(s * capl, arr.shape[1])
        return np.ascontiguousarray(arr.reshape(capl, s).T).reshape(s * capl)

    def _sync(self) -> None:
        if not self._dirty and self._dirty_rows:
            self._scatter_sync()
            return
        if not self._dirty:
            return
        self._dirty_rows.clear()
        if self.storage_dtype in ("int8", "int8x2"):
            from embeddinghub_tpu.index.flat import apply_quant_guard

            apply_quant_guard(self)
        x = self._hx
        if self.metric == "cosine":
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.maximum(norms, 1e-30)
        row_sharding = NamedSharding(self.mesh, P(SHARD_AXIS))
        if self.storage_dtype in ("int8", "int8x2"):
            # quantize on the HOST and ship int8 (quarter the upload
            # bytes — the wire is the bottleneck, like FlatIndex._sync)
            hi, scales, lo = quantize_rows(
                x, residual=self.storage_dtype == "int8x2"
            )
            self._dx = jax.device_put(self._shard_major(hi), row_sharding)
            self._dscales = jax.device_put(
                self._shard_major(scales), row_sharding
            )
            if self.storage_dtype == "int8x2":
                self._dx_lo = jax.device_put(
                    self._shard_major(lo), row_sharding
                )
        else:
            self._dx = jax.device_put(self._shard_major(x), row_sharding)
        self._dx_sq = jax.device_put(
            self._shard_major(np.einsum("nd,nd->n", x, x)), row_sharding
        )
        self._dvalid = jax.device_put(self._shard_major(self._hvalid), row_sharding)
        self._dirty = False
        self._search_fn = None  # shapes may have changed

    def _scatter_sync(self) -> None:
        """Streaming batched inserts (BASELINE config 4): scatter dirty
        host rows into the sharded device arrays in place.  Host row
        r = local*S + shard maps to device row shard*capL + local; the
        update indices are replicated, XLA routes each write to its
        owning shard."""
        rows = np.fromiter(self._dirty_rows, dtype=np.int64)
        padded = next_pow2(rows.size, floor=8)
        rows = np.concatenate(
            [rows, np.full(padded - rows.size, rows[0], np.int64)]
        )
        vecs = self._hx[rows]
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-30)
        s, capl = self.n_shards, self._cap_local
        dev_rows = (rows % s) * capl + rows // s
        valid_bits = self._hvalid[rows]
        if self.storage_dtype in ("int8", "int8x2"):
            qrows, scales, lorows = quantize_rows(
                vecs, residual=self.storage_dtype == "int8x2"
            )
            if self.storage_dtype == "int8x2":
                self._dx_lo = self._dx_lo.at[
                    jnp.asarray(dev_rows.astype(np.int32))
                ].set(jnp.asarray(lorows))
            self._dx, self._dscales, self._dx_sq, self._dvalid = (
                _sharded_scatter_q(
                    self._dx,
                    self._dscales,
                    self._dx_sq,
                    self._dvalid,
                    jnp.asarray(dev_rows.astype(np.int32)),
                    jnp.asarray(qrows),
                    jnp.asarray(scales),
                    jnp.asarray(np.einsum("nd,nd->n", vecs, vecs)),
                    jnp.asarray(valid_bits),
                )
            )
            self._dirty_rows.clear()
            return
        self._dx, self._dx_sq, self._dvalid = _sharded_scatter(
            self._dx,
            self._dx_sq,
            self._dvalid,
            jnp.asarray(dev_rows.astype(np.int32)),
            jnp.asarray(vecs),
            jnp.asarray(np.einsum("nd,nd->n", vecs, vecs)),
            jnp.asarray(valid_bits),
        )
        self._dirty_rows.clear()

    # ----------------------------------------------------------------- search

    def _build_search(self, k: int):
        mesh = self.mesh
        metric = self.metric
        chunk = min(self._cap_local, self._chunk_target)
        compute_dtype = self.compute_dtype
        n_shards = self.n_shards
        int8 = self.storage_dtype in ("int8", "int8x2")
        residual = self.storage_dtype == "int8x2"
        over = min(
            16 if residual else 8, max(1, self._cap_local // max(k, 1))
        )

        def merge(d, i, q):
            # local row p on shard s is host row p * S + s
            shard = jax.lax.axis_index(SHARD_AXIS)
            i_host = jnp.where(i >= 0, i * n_shards + shard, -1)
            # ICI all-gather of per-shard candidates: [S, B, k]
            dg = jax.lax.all_gather(d, SHARD_AXIS)
            ig = jax.lax.all_gather(i_host, SHARD_AXIS)
            b = q.shape[0]
            dd = jnp.transpose(dg, (1, 0, 2)).reshape(b, n_shards * k)
            ii = jnp.transpose(ig, (1, 0, 2)).reshape(b, n_shards * k)
            dd = jnp.where(ii >= 0, dd, jnp.inf)
            nd, pos = jax.lax.top_k(-dd, k)
            return -nd, jnp.take_along_axis(ii, pos, axis=1)

        # Deep shards (>2M rows) must not materialize the one-shot
        # [B, cap_local] score matrix — stream the quantized scan in
        # chunks exactly like FlatIndex does past 2^21 rows
        deep = self._cap_local > (1 << 21)
        qchunk = min(self._cap_local, 1 << 18)

        if int8 and residual:
            def local_search(q, xq, scales, valid, x_sq, x_lo):
                if deep:
                    d, i = topk_ops.quantized_chunked_exact(
                        q, xq, scales, valid, x_sq, x_lo,
                        metric=metric, k=k, oversample=over, chunk=qchunk,
                    )
                else:
                    d, i = topk_ops.int8_oversample_search(
                        q, xq, scales, valid, x_sq, x_lo,
                        metric=metric, k=k, oversample=over,
                    )
                return merge(d, i, q)

            in_specs = (
                P(None, None), P(SHARD_AXIS, None), P(SHARD_AXIS),
                P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS, None),
            )
        elif int8:
            def local_search(q, xq, scales, valid, x_sq):
                if deep:
                    d, i = topk_ops.quantized_chunked_exact(
                        q, xq, scales, valid, x_sq, None,
                        metric=metric, k=k, oversample=over, chunk=qchunk,
                    )
                else:
                    d, i = topk_ops.int8_oversample_search(
                        q, xq, scales, valid, x_sq, None,
                        metric=metric, k=k, oversample=over,
                    )
                return merge(d, i, q)

            in_specs = (
                P(None, None), P(SHARD_AXIS, None), P(SHARD_AXIS),
                P(SHARD_AXIS), P(SHARD_AXIS),
            )
        else:
            def local_search(q, x, valid, x_sq):
                # q replicated [B, D]; x/valid/x_sq are this shard's rows.
                d, i = topk_ops.chunked_topk_search(
                    q, x, valid, x_sq,
                    metric=metric, k=k, chunk=chunk,
                    compute_dtype=compute_dtype,
                )
                return merge(d, i, q)

            in_specs = (
                P(None, None), P(SHARD_AXIS, None), P(SHARD_AXIS),
                P(SHARD_AXIS),
            )

        fn = shard_map(
            local_search,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        queries = as_f32_matrix(queries, self.dims)
        b = queries.shape[0]
        if self._size == 0 or k <= 0:
            return (
                np.full((b, max(k, 0)), np.inf, np.float32),
                np.full((b, max(k, 0)), -1, np.int64),
            )
        self._sync()
        kk = min(next_pow2(k, floor=1), self._cap_local)
        if self._search_fn is None or self._search_k != kk:
            self._search_fn = self._build_search(kk)
            self._search_k = kk
        pb = _bucket(b)
        if pb > b:
            queries = np.concatenate(
                [queries, np.zeros((pb - b, self.dims), np.float32)]
            )
        if self.metric == "cosine":
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-30)
        if self.storage_dtype == "int8x2":
            d, i = self._search_fn(
                jnp.asarray(queries), self._dx, self._dscales,
                self._dvalid, self._dx_sq, self._dx_lo,
            )
        elif self.storage_dtype == "int8":
            d, i = self._search_fn(
                jnp.asarray(queries), self._dx, self._dscales,
                self._dvalid, self._dx_sq,
            )
        else:
            d, i = self._search_fn(
                jnp.asarray(queries), self._dx, self._dvalid, self._dx_sq
            )
        d = np.asarray(d)[:b, :k]
        i = np.asarray(i)[:b, :k].astype(np.int64)
        i[~np.isfinite(d)] = -1
        return d, i

    # ------------------------------------------------------------------ misc

    def vector(self, row: int) -> np.ndarray:
        return self._hx[row].copy()

    def vectors(self, rows: np.ndarray) -> np.ndarray:
        return self._hx[np.asarray(rows, dtype=np.int64)]

    # -------------------------------------------------------------- snapshot

    _STORAGE_CODES = {"float32": 0, "int8": 2, "int8x2": 3}

    def state_arrays(self) -> dict[str, np.ndarray]:
        return {
            "x": self._hx,
            "valid": self._hvalid,
            "sflat_meta": np.asarray(
                [self._STORAGE_CODES.get(self.storage_dtype, 0)], np.int32
            ),
        }

    @classmethod
    def from_state(
        cls, dims: int, metric: str, arrays: dict[str, np.ndarray], **kw
    ) -> "ShardedFlatIndex":
        if "sflat_meta" in arrays and "storage_dtype" not in kw:
            codes = {v: k for k, v in cls._STORAGE_CODES.items()}
            kw = dict(
                kw, storage_dtype=codes[int(arrays["sflat_meta"][0])]
            )
        arrays = {k: v for k, v in arrays.items() if k != "sflat_meta"}
        idx = cls(dims, metric=metric, capacity=arrays["x"].shape[0], **kw)
        n = arrays["x"].shape[0]
        idx._hx[:n] = arrays["x"]
        idx._hvalid[:n] = arrays["valid"]
        idx._size = int(np.count_nonzero(idx._hvalid))
        idx._dirty = True
        return idx
