"""FlatIndex — exact k-NN as streaming brute force on the MXU.

This is the default engine.  Design rationale: on TPU the systolic array
turns exhaustive search into a bandwidth-bound streaming matmul, so for
index sizes that fit one chip's HBM, *exact* search is both faster than a
graph walk for batched queries and gives recall 1.0 by construction —
strictly dominating the reference's hnswlib defaults (recall@10 targets
in BASELINE.md).  The graph index exists for larger-than-HBM / latency-
bound regimes (:mod:`embeddinghub_tpu.index.hnsw`).

Replaces: reference ``embeddingstore/index.cc`` (hnswlib wrapper).
Growth policy matches the reference: capacity starts small and doubles
(``index.h:21``, ``index.cc:29-31``), which on TPU also bounds
recompilation: shapes only change on doubling.

Storage model:
  * host side is authoritative: a packed float32 ``[cap, D]`` arena
    (numpy; the C++ arena in ``native/`` slots in here) — fast point
    writes, snapshot source of truth;
  * device side is a lazily-synced copy used by the search kernels;
    small dirty sets are scatter-updated in place, large ones re-upload.
"""

from __future__ import annotations

import functools
import os
from contextlib import nullcontext as _nullcontext

import jax
import jax.numpy as jnp
import numpy as np

from embeddinghub_tpu.index.base import (
    Index,
    as_f32_matrix,
    next_pow2,
    quantize_rows,
)
from embeddinghub_tpu.ops import distance as dist_ops
from embeddinghub_tpu.ops import topk as topk_ops

# Query batches are padded to these sizes so the jitted search kernel only
# ever sees a few distinct shapes.
_BATCH_BUCKETS = (1, 8, 64, 256, 1024)

# Past this row count the arena stops padding to pow2: at 50M rows pow2
# burns 17.1M phantom rows (~2.1 GB of int8x2 arena, enough to OOM the
# 15.75 GB chip — benchmarks/artifacts/r4_cap50m.log); the chunked
# search only requires cap % (1 << 20) == 0, so deep arenas round up to
# 1M-row blocks instead.
_DEEP_CAP_THRESHOLD = 1 << 21
_DEEP_CAP_BLOCK = 1 << 20


def _round_capacity(need: int) -> int:
    if need <= _DEEP_CAP_THRESHOLD:
        return next_pow2(max(need, 128), floor=128)
    return -(-need // _DEEP_CAP_BLOCK) * _DEEP_CAP_BLOCK

# Rewriting more than this fraction of capacity triggers a full re-upload
# instead of a scatter.
_SCATTER_LIMIT = 0.25

# Deep arenas (cap > _DEEP_CAP_THRESHOLD) build their device mirror by
# STAGING: the 2-D planes are allocated ON DEVICE by a jitted zeros (so
# their layout is the canonical tiled layout every consumer executable
# expects) and filled by per-block donated dynamic_update_slice writes.
# A whole-arena ``device_put`` instead arrives in the transfer path's
# compact layout, and the first consumer program then materializes a
# FULL-ARENA relayout copy (measured: ``copy(xq)`` 9.0 GB -> 12.0 GB
# tiled at 100M x 96 int8, compile-OOM at 21.7 GB —
# benchmarks/artifacts/r4_cap100m.log).  Staged blocks bound that
# relayout temp to block size.  Block rows are chosen so a block is
# ~64 MB at 96-128 dims.
_STAGE_BLOCK_ROWS = 1 << 19

# Quantization-regime guard (see FlatIndex._quant_regime_check).
_GUARD_MIN_ROWS = 4096
_GUARD_SAMPLE = 16384
_GUARD_QUERIES = 256
_GUARD_K = 10
_GUARD_RECALL = 0.95
# The pre-upload sample guard only ever walks int8 -> int8x2 -> bfloat16
# (its while-loop gates on the int8 dtypes); the measured post-ingest
# audit (FlatIndex.audit_and_escalate) can take the last step to f32
# when even bf16 score noise sits above the true neighbor gaps.
_ESCALATION = {"int8": "int8x2", "int8x2": "bfloat16", "bfloat16": "float32"}

_log = __import__("logging").getLogger("embeddinghub_tpu.index")


def _simulate_quant_recall(
    x: np.ndarray, x_sq: np.ndarray, metric: str, storage_dtype: str
) -> float:
    """Host-side dry run of the two-phase quantized search on a sample:
    phase-1 ranks by the int8 hi-plane score (queries int8-quantized like
    the kernel does for the int32 MXU accumulate), pools ``k*oversample``
    candidates, then reranks them against the dequantized rows (hi, or
    hi+lo for int8x2).  Returns recall@k vs the exact f32 ranking on the
    same sample.  This is exactly the failure mode RESULTS.md measured at
    Deep-10M (clustered near-duplicates: true score gaps below int8
    noise -> recall 0.44): if the *sample* ranking scrambles, the full
    index will too."""
    k = _GUARD_K
    nq = min(_GUARD_QUERIES, x.shape[0])
    q = x[:nq]
    dots = q @ x.T
    s_true = dots if metric == "cosine" else 2.0 * dots - x_sq[None, :]
    true_top = np.argpartition(-s_true, k, axis=1)[:, :k]

    residual = storage_dtype == "int8x2"
    hi, sc, lo = quantize_rows(x, residual=residual)
    qsc = np.maximum(np.abs(q).max(axis=1, keepdims=True) / 127.0, 1e-30)
    qq = np.clip(np.round(q / qsc), -127, 127)
    dots_hi = (qq @ hi.T.astype(np.float32)) * qsc * sc[None, :]
    s1 = dots_hi if metric == "cosine" else 2.0 * dots_hi - x_sq[None, :]
    kk = min(k * (16 if residual else 8), x.shape[0] - 1)
    pool = np.argpartition(-s1, kk, axis=1)[:, :kk]

    x_deq = hi.astype(np.float32)
    if residual:
        x_deq = x_deq + lo.astype(np.float32) / 254.0
    x_deq *= sc[:, None]
    hits = 0
    for qi in range(nq):
        cand = pool[qi]
        d2 = q[qi] @ x_deq[cand].T
        s2 = d2 if metric == "cosine" else 2.0 * d2 - x_sq[cand]
        picked = cand[np.argsort(-s2)[:k]]
        hits += np.intersect1d(picked, true_top[qi]).size
    return hits / (nq * k)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_rows(x, x_sq, valid, rows, vecs, vecs_sq):
    x = x.at[rows].set(vecs)
    x_sq = x_sq.at[rows].set(vecs_sq)
    valid = valid.at[rows].set(True)
    return x, x_sq, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_rows_int8(x, x_sq, valid, scales, rows, qrows, vecs_sq, srows):
    # Every arena buffer is donated: at 50M rows the previous undonated
    # ``.at[].set`` on the scale/residual arenas forced full-size copies
    # (4.8 GB for the int8x2 lo arena alone) and OOMed the chip mid
    # stream-insert (benchmarks/artifacts/r4_cap50m_b256.log).
    x = x.at[rows].set(qrows)
    x_sq = x_sq.at[rows].set(vecs_sq)
    valid = valid.at[rows].set(True)
    scales = scales.at[rows].set(srows)
    return x, x_sq, valid, scales


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _scatter_rows_int8x2(
    x, x_lo, x_sq, valid, scales, rows, qrows, lorows, vecs_sq, srows
):
    x = x.at[rows].set(qrows)
    x_lo = x_lo.at[rows].set(lorows)
    x_sq = x_sq.at[rows].set(vecs_sq)
    valid = valid.at[rows].set(True)
    scales = scales.at[rows].set(srows)
    return x, x_lo, x_sq, valid, scales


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_invalidate(valid, rows):
    return valid.at[rows].set(False)


_SCATTER_REGION_ROWS = 1 << 23  # deep-arena scatter region (rows)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("width",))
def _region_scatter_plane(x, rows_local, qrows, start, width):
    """Scatter rows into a DEEP quantized plane via a bounded region:
    slice [start, start+width), scatter locally, write back (donated).

    A whole-arena ``x.at[rows].set`` compiles a full-size operand copy
    even under donation — at 100M x 96 int8 that copy is 12 GB (lane
    padding 96->128) on top of the 12 GB resident plane and the AOT
    compile itself OOMs (r5_cap100m_stream.log).  Region temps are
    ~2 x width rows instead; ``start`` is traced so every region shares
    one executable."""
    reg = jax.lax.dynamic_slice_in_dim(x, start, width, 0)
    reg = reg.at[rows_local].set(qrows)
    return jax.lax.dynamic_update_slice_in_dim(x, reg, start, 0)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_aux_int8(x_sq, valid, scales, rows, vecs_sq, srows):
    """The [cap]-wide scalar arenas still scatter whole (donated): their
    full-size copies are cap * 9 bytes — fine at any single-chip cap."""
    return (
        x_sq.at[rows].set(vecs_sq),
        valid.at[rows].set(True),
        scales.at[rows].set(srows),
    )


@functools.partial(jax.jit, static_argnames=("cap", "dims", "dtype"))
def _deep_alloc(cap: int, dims: int, dtype: str):
    """Device-side arena allocation: the output layout is whatever XLA
    canonically assigns this shape/dtype — i.e. exactly the layout the
    (equally default-laid-out) search executables expect their arena
    parameter in, so no consumer ever inserts a whole-arena relayout
    copy (see _STAGE_BLOCK_ROWS)."""
    return jnp.zeros((cap, dims), dtype=dtype)


@functools.partial(jax.jit, donate_argnums=(0,))
def _deep_write(dst, blk, start):
    """Donated block write into a staged deep arena (in-place: dst is
    aliased to the output, the only temp is the block's relayout)."""
    return jax.lax.dynamic_update_slice_in_dim(
        dst, blk.astype(dst.dtype), start, 0
    )


@jax.jit
def _dequant_queries(qi8, scales):
    # bf16 multiply is exact here: scales carry the magnitude (wide bf16
    # exponent range) while qi8 in [-127, 127] is exactly representable.
    return qi8.astype(jnp.bfloat16) * scales[:, None].astype(jnp.bfloat16)


def _upload_queries(queries: np.ndarray, query_dtype: str | None) -> jax.Array:
    """Ship a query batch over the (wire-bound) host->device link in the
    narrowest acceptable dtype.  ``None`` uploads f32; ``"bfloat16"``
    halves the bytes; ``"int8"`` quarters them via per-query symmetric
    quantization dequantized on device — worst-case per-dim error is
    ``max|q|/254``, which barely perturbs score order (measured recall
    impact < 1e-3 next to the bf16 score matmul the fast paths already
    use).  The search ops upcast to f32 on device, so any of these feeds
    every scoring path unchanged."""
    if query_dtype == "int8":
        qi8, scales, _ = quantize_rows(queries)
        return _dequant_queries(jnp.asarray(qi8), jnp.asarray(scales))
    if query_dtype == "bfloat16":
        import ml_dtypes

        return jnp.asarray(queries.astype(ml_dtypes.bfloat16))
    if query_dtype is not None and query_dtype != "float32":
        # a typo ("bf16", "float16") must not silently 4x the upload
        raise ValueError(f"unknown query_dtype {query_dtype!r}")
    return jnp.asarray(queries)


def apply_quant_guard(idx) -> None:
    """Guard against the quantization-resolution regime before a device
    arena is (re)built.  Shared by :class:`FlatIndex` and
    ``parallel.sharded_flat.ShardedFlatIndex`` (duck-typed over
    ``_hx/_hvalid/_size/metric/storage_dtype/quant_guard/
    _guard_checked_size``).  Cheap: a [256, 16k] host matmul per full
    sync — full syncs only happen on capacity growth or >25% churn,
    next to a multi-GB quantize+upload.  Escalation only ever narrows
    the failure (int8 -> int8x2 -> bfloat16); it never de-escalates,
    and it persists via the index's storage-dtype snapshot code."""
    while (
        idx.quant_guard
        and idx.storage_dtype in ("int8", "int8x2")
        and idx._size >= max(_GUARD_MIN_ROWS, 2 * idx._guard_checked_size)
    ):
        live = np.flatnonzero(idx._hvalid)
        rng = np.random.default_rng(0xE17)
        samp = rng.choice(
            live, size=min(live.size, _GUARD_SAMPLE), replace=False
        )
        x = idx._hx[samp]
        if idx.metric == "cosine":
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-30
            )
        x_sq = np.einsum("nd,nd->n", x, x, dtype=np.float32)
        recall = _simulate_quant_recall(x, x_sq, idx.metric, idx.storage_dtype)
        idx._guard_checked_size = idx._size
        if recall >= _GUARD_RECALL:
            return
        nxt = _ESCALATION[idx.storage_dtype]
        if nxt not in idx._STORAGE_CODES:
            # the sharded arena has no bf16 plane — fall back to f32
            nxt = "float32"
        _log.warning(
            "quant guard: %s ranking scores recall@%d %.3f < %.2f on a "
            "%d-row sample (score gaps below quantization noise) — "
            "escalating storage to %s",
            idx.storage_dtype, _GUARD_K, recall, _GUARD_RECALL,
            samp.size, nxt,
        )
        idx.storage_dtype = nxt
        idx._guard_checked_size = 0  # re-check the escalated dtype


class _PackedIds:
    """Async id handle whose device payload is a bit-packed word stream
    (ops/bitpack): ``np.asarray(handle)`` blocks, transfers the packed
    words and unpacks to the [b, k] int64 id block — callers keep the
    exact ``search_async`` contract while the wire carries
    ~bits/32 of the int32 bytes."""

    __slots__ = ("words", "b", "k", "bits")

    def __init__(self, words, b: int, k: int, bits: int):
        self.words, self.b, self.k, self.bits = words, b, k, bits

    @property
    def shape(self):
        return (self.b, self.k)

    def __array__(self, dtype=None, copy=None):
        from embeddinghub_tpu.ops import bitpack

        ids = bitpack.unpack_ids(
            np.asarray(self.words), self.b * self.k, bits=self.bits
        ).reshape(self.b, self.k)
        return ids if dtype is None else ids.astype(dtype)


class FlatIndex(Index):
    def __init__(
        self,
        dims: int,
        metric: str = "l2",
        capacity: int = 128,
        chunk_target: int = 65536,
        compute_dtype: str = "float32",
        storage_dtype: str = "float32",
        device: jax.Device | None = None,
        quant_guard: bool = True,
    ):
        """``storage_dtype``: "float32" (default), "bfloat16" (2x HBM
        capacity, ~62M 128-d rows/16GB chip), "int8" (4x, ~125M rows
        — the Deep-100M lever; per-row symmetric quantization with
        rerank of dequantized candidates) or "int8x2" (2x; int8 hi +
        int8 residual lo ≈ int15 resolution — phase-1 scans hi only so
        the scan bandwidth matches "int8", while the hi+lo rerank
        resolves dense near-duplicate clusters whose score gaps sit
        below int8 noise). The host arena always stays f32.

        ``quant_guard`` (default on): int8/int8x2 arenas are checked at
        full-sync time against the quantization-resolution failure
        regime (true top-k score gaps below quantization noise — e.g.
        dense near-duplicate clusters, where raw int8 measured recall
        0.44 at Deep-10M).  When the sampled two-phase recall falls
        below 0.95 the storage dtype auto-escalates int8 -> int8x2 ->
        bfloat16 with a logged notice, so a user picking
        ``engine="flat-int8"`` on clustered data cannot silently get a
        broken index."""
        if metric not in dist_ops.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        self.dims = int(dims)
        self.metric = metric
        self.compute_dtype = compute_dtype
        self.storage_dtype = storage_dtype
        self._chunk_target = chunk_target
        self._device = device
        self._cap = _round_capacity(max(capacity, 128))
        # Host-authoritative arena (preprocessed for the metric).
        self._hx = np.zeros((self._cap, self.dims), dtype=np.float32)
        self._hvalid = np.zeros((self._cap,), dtype=bool)
        self._size = 0
        # Device mirrors, built lazily.
        self._dx = None
        self._dx_lo = None
        self._dx_sq = None
        self._dvalid = None
        self._dirty_rows: set[int] = set()
        self._needs_full_sync = True
        self.quant_guard = bool(quant_guard)
        self._guard_checked_size = 0
        # Phase-1 candidate-pool multiplier: the HBM-free lever against
        # the deep pool-containment regime (audit_and_escalate widens
        # this before it reaches for a wider storage dtype).  Persisted
        # in snapshots (flat_meta[1]).
        self.oversample_boost = 1
        # Host cache of the quantized device planes (hi/lo/scales/x_sq)
        # from the last full sync — snapshot persists it so restore
        # skips the multi-minute re-quantization, and a dtype audit
        # escalation drops it.  None = stale/absent.
        self._hq: dict | None = None

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
        if self._needs_full_sync and self._hq is not None:
            # rows written outside the scatter path must be reflected in
            # the cached quantized planes row-wise (cheap: per-row host
            # quantize) — dropping the cache instead would force a full
            # multi-minute re-quantization after e.g. a WAL tail replay
            if self._hq_fresh():
                self._hq_update_rows(rows, vecs)
            else:
                self._hq = None

    def remove(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        rows = rows[(rows >= 0) & (rows < self._cap)]
        live = self._hvalid[rows]
        self._size -= int(np.count_nonzero(live))
        self._hvalid[rows] = False
        self._mark_dirty(rows)

    def _ensure_capacity(self, need: int) -> None:
        if need <= self._cap:
            return
        # keep 12.5% headroom past the deep threshold so streaming adds
        # amortize without pow2's up-to-2x overshoot
        new_cap = _round_capacity(
            max(need, self._cap + self._cap // 8)
            if self._cap > _DEEP_CAP_THRESHOLD or need > _DEEP_CAP_THRESHOLD
            else need
        )
        new_cap = max(new_cap, self._cap)
        grown_x = np.zeros((new_cap, self.dims), dtype=np.float32)
        grown_x[: self._cap] = self._hx
        grown_v = np.zeros((new_cap,), dtype=bool)
        grown_v[: self._cap] = self._hvalid
        self._hx, self._hvalid, self._cap = grown_x, grown_v, new_cap
        self._needs_full_sync = True
        self._hq = None  # shape changed; quantized planes are stale

    def _deep_chunk(self, pb: int) -> int:
        """Scan-chunk rows for the deep quantized path: bounds the
        [B, chunk] per-step intermediate to ~1 GB, capped at the
        capacity rounding block so ``cap % chunk == 0`` holds for
        non-pow2 deep capacities."""
        return min(
            self._cap,
            _DEEP_CAP_BLOCK,
            max(1 << 16, (1 << 28) // max(pb, 1)),
        )

    def _mark_dirty(self, rows: np.ndarray) -> None:
        if self._needs_full_sync:
            return
        self._dirty_rows.update(int(r) for r in rows)
        if len(self._dirty_rows) > _SCATTER_LIMIT * self._cap:
            self._needs_full_sync = True
            self._dirty_rows.clear()

    # ------------------------------------------------------------------- sync

    def _quant_regime_check(self) -> None:
        apply_quant_guard(self)

    def _hq_fresh(self) -> bool:
        """Whether the cached quantized planes describe the CURRENT
        arena shape + storage dtype (row contents are kept accurate by
        the write paths; shape/dtype changes invalidate wholesale)."""
        return (
            self._hq is not None
            and self._hq["dtype"] == self.storage_dtype
            and self._hq["hi"].shape[0] == self._cap
        )

    def _hq_update_rows(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        """Row-wise update of the cached quantized planes from RAW f32
        vectors (metric preprocessing applied here, exactly as the full
        `_quantized_planes` pass does)."""
        if self.metric == "cosine":
            nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(nrm, 1e-30)
        hq = self._hq
        hq["sq"][rows] = np.einsum("nd,nd->n", vecs, vecs, dtype=np.float32)
        if self.storage_dtype in ("int8", "int8x2"):
            hi, sc, lo = quantize_rows(
                vecs, residual=self.storage_dtype == "int8x2"
            )
            hq["hi"][rows] = hi
            hq["sc"][rows] = sc
            if lo is not None:
                hq["lo"][rows] = lo
        else:
            hq["hi"][rows] = vecs.astype(hq["hi"].dtype)

    def _quantized_planes(self) -> dict:
        """Host-side quantized device planes for the current arena —
        computed once and cached (``self._hq``): a 50M-row x 96-d
        quantization costs minutes of single-core host time, and the
        cache is what lets snapshot/restore skip it entirely (restore
        measured 203 s vs a 33 s snapshot at 10M in r4, most of it
        re-quantization + re-upload; persisted planes cut restore to the
        wire-floor upload)."""
        if self._hq_fresh():
            return self._hq
        import ml_dtypes

        n = self._cap
        int8 = self.storage_dtype in ("int8", "int8x2")
        residual = self.storage_dtype == "int8x2"
        xq = np.empty((n, self.dims), np.int8 if int8 else ml_dtypes.bfloat16)
        xlo = np.empty((n, self.dims), np.int8) if residual else None
        xsq = np.empty((n,), np.float32)
        scales = np.empty((n,), np.float32) if int8 else None
        step = max(1, (1 << 28) // max(self.dims * 4, 1))
        for s in range(0, n, step):
            e = min(n, s + step)
            blk = self._hx[s:e]
            if self.metric == "cosine":
                nrm = np.linalg.norm(blk, axis=1, keepdims=True)
                blk = blk / np.maximum(nrm, 1e-30)
            xsq[s:e] = np.einsum("nd,nd->n", blk, blk, dtype=np.float32)
            if int8:
                hi, sc, lo = quantize_rows(blk, residual=residual)
                scales[s:e] = sc
                xq[s:e] = hi
                if residual:
                    xlo[s:e] = lo
            else:
                xq[s:e] = blk.astype(ml_dtypes.bfloat16)
        self._hq = {
            "dtype": self.storage_dtype,
            "hi": xq,
            "lo": xlo,
            "sq": xsq,
            "sc": scales,
        }
        return self._hq

    def _staged_put(self, plane: np.ndarray) -> jax.Array:
        """Deep-arena upload: allocate the device plane with a jitted
        zeros (canonical tiled layout — the layout every consumer
        executable expects) and fill it with per-block donated
        dynamic_update_slice writes, so no program ever materializes a
        whole-arena relayout copy (the 21.7 GB compile-OOM of
        benchmarks/artifacts/r4_cap100m.log).  Peak HBM = tiled arena +
        one ~64 MB block."""
        cap, d = plane.shape
        ctx = (
            jax.default_device(self._device)
            if self._device is not None
            else _nullcontext()
        )
        with ctx:
            dst = _deep_alloc(cap, d, str(plane.dtype))
            step = min(_STAGE_BLOCK_ROWS, cap)
            for s in range(0, cap, step):
                if s + step <= cap:
                    blk, start = plane[s : s + step], s
                else:
                    # tail: re-write the last full block (overlap rows
                    # carry identical values) so ONE block shape compiles
                    blk, start = plane[cap - step : cap], cap - step
                dst = _deep_write(
                    dst,
                    jax.device_put(blk, self._device),
                    jnp.int32(start),
                )
        return dst

    def _sync(self) -> None:
        # The host arena keeps *raw* vectors (get() must return exactly what
        # was set); metric preprocessing (cosine -> unit rows) happens here,
        # on the way to the device.
        if self._needs_full_sync or self._dx is None:
            self._quant_regime_check()
            if self.storage_dtype in ("int8", "int8x2", "bfloat16"):
                # Quantize on the HOST and ship the narrow dtype over the
                # wire: the dev tunnel (~35 MB/s) is the bottleneck, so a
                # full sync of an int8/bf16 arena must not upload f32 and
                # cast on device (4x / 2x the bytes).  Chunked so the
                # temporary never doubles a multi-GB arena.
                planes = self._quantized_planes()
                deep = self._cap > _DEEP_CAP_THRESHOLD
                put = self._staged_put if deep else (
                    lambda a: jax.device_put(a, self._device)
                )
                self._dx = put(planes["hi"])
                self._dx_sq = jax.device_put(planes["sq"], self._device)
                self._dscales = (
                    jax.device_put(planes["sc"], self._device)
                    if planes["sc"] is not None
                    else None
                )
                self._dx_lo = (
                    put(planes["lo"]) if planes["lo"] is not None else None
                )
            else:
                x = jax.device_put(jnp.asarray(self._hx), self._device)
                xp = dist_ops.preprocess_vectors(x, self.metric)
                self._dx_sq = dist_ops.sqnorms(xp)
                self._dx = xp.astype(self.storage_dtype)
                self._dscales = None
                self._dx_lo = None
            self._dvalid = jax.device_put(jnp.asarray(self._hvalid), self._device)
            self._needs_full_sync = False
            self._dirty_rows.clear()
            return
        if not self._dirty_rows:
            return
        rows = np.fromiter(self._dirty_rows, dtype=np.int32)
        # Pad to a pow2 bucket (repeating the first row) to bound the number
        # of scatter-kernel shapes XLA must compile.
        padded = next_pow2(rows.size, floor=8)
        rows = np.concatenate([rows, np.full(padded - rows.size, rows[0], np.int32)])
        vecs = self._hx[rows]
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-30)
        valid_bits = self._hvalid[rows]
        if self.storage_dtype in ("int8", "int8x2"):
            # int8 scatter: re-quantize the touched rows host-side, then
            # one fully-donated scatter over every arena buffer (see
            # _scatter_rows_int8x2 for why donation is load-bearing).
            qrows, scales, lorows = quantize_rows(
                vecs, residual=self.storage_dtype == "int8x2"
            )
            sq = np.einsum("nd,nd->n", vecs, vecs)
            if self._hq_fresh():
                # keep the cached planes row-accurate so snapshots can
                # persist them after streaming writes
                self._hq["hi"][rows] = qrows
                self._hq["sc"][rows] = scales
                self._hq["sq"][rows] = sq
                if lorows is not None:
                    self._hq["lo"][rows] = lorows
            jrows = jnp.asarray(rows)
            jsq = jnp.asarray(sq)
            deep = self._cap > _DEEP_CAP_THRESHOLD
            if deep:
                # regioned plane scatter (see _region_scatter_plane):
                # whole-plane scatters compile an arena-sized operand
                # copy that OOMs past ~50M rows
                width = min(self._cap, _SCATTER_REGION_ROWS)
                order = np.argsort(rows, kind="stable")
                r_s, q_s = rows[order], qrows[order]
                l_s = lorows[order] if lorows is not None else None
                for reg in np.unique(r_s // width):
                    m = (r_s // width) == reg
                    # dynamic_slice clamps start to cap-width: compute
                    # local offsets against the clamped start or the
                    # last region's rows land width-misaligned
                    start_np = min(int(reg) * width, self._cap - width)
                    rl = (r_s[m] - start_np).astype(np.int32)
                    pad = next_pow2(rl.size, floor=8)
                    sel = np.concatenate(
                        [np.arange(rl.size),
                         np.zeros(pad - rl.size, np.int64)]
                    )
                    rl = rl[sel]
                    start = jnp.int32(start_np)
                    self._dx = _region_scatter_plane(
                        self._dx, jnp.asarray(rl),
                        jnp.asarray(q_s[m][sel]), start, width=width,
                    )
                    if l_s is not None:
                        self._dx_lo = _region_scatter_plane(
                            self._dx_lo, jnp.asarray(rl),
                            jnp.asarray(l_s[m][sel]), start, width=width,
                        )
                self._dx_sq, self._dvalid, self._dscales = (
                    _scatter_aux_int8(
                        self._dx_sq, self._dvalid, self._dscales,
                        jrows, jsq, jnp.asarray(scales),
                    )
                )
            elif self.storage_dtype == "int8x2":
                (self._dx, self._dx_lo, self._dx_sq, self._dvalid,
                 self._dscales) = _scatter_rows_int8x2(
                    self._dx, self._dx_lo, self._dx_sq, self._dvalid,
                    self._dscales, jrows, jnp.asarray(qrows),
                    jnp.asarray(lorows), jsq, jnp.asarray(scales),
                )
            else:
                (self._dx, self._dx_sq, self._dvalid,
                 self._dscales) = _scatter_rows_int8(
                    self._dx, self._dx_sq, self._dvalid, self._dscales,
                    jrows, jnp.asarray(qrows), jsq, jnp.asarray(scales),
                )
            if not valid_bits.all():
                dead = rows[~valid_bits]
                padded = next_pow2(dead.size, floor=8)
                dead = np.concatenate(
                    [dead, np.full(padded - dead.size, dead[0], np.int32)]
                )
                self._dvalid = _scatter_invalidate(self._dvalid, jnp.asarray(dead))
            self._dirty_rows.clear()
            return
        sq = np.einsum("nd,nd->n", vecs, vecs)
        if self._hq_fresh():
            self._hq["hi"][rows] = vecs.astype(self._hq["hi"].dtype)
            self._hq["sq"][rows] = sq
        self._dx, self._dx_sq, self._dvalid = _scatter_rows(
            self._dx,
            self._dx_sq,
            self._dvalid,
            jnp.asarray(rows),
            jnp.asarray(vecs).astype(self._dx.dtype),
            jnp.asarray(sq),
        )
        # Scatter marks everything valid; re-invalidate removed rows.
        if not valid_bits.all():
            dead = rows[~valid_bits]
            padded = next_pow2(dead.size, floor=8)
            dead = np.concatenate(
                [dead, np.full(padded - dead.size, dead[0], np.int32)]
            )
            self._dvalid = _scatter_invalidate(self._dvalid, jnp.asarray(dead))
        self._dirty_rows.clear()

    # ----------------------------------------------------------------- search

    def _pack_wire_ok(self, b: int, k: int) -> bool:
        """Pack the ids-only readback when the wire win is real: big
        enough id block, narrow enough ids, and an accelerator on the
        other side of a link (CPU arrays are already host-resident).
        ``EHTPU_FORCE_PACK_IDS=1`` forces it for CPU-mesh tests."""
        from embeddinghub_tpu.ops import bitpack

        if b * k < 2048 or bitpack.bits_for(self._cap) > 28:
            return False
        return (
            jax.default_backend() != "cpu"
            or os.environ.get("EHTPU_FORCE_PACK_IDS") == "1"
        )

    def _ids_to_host(self, idev) -> np.ndarray:
        """Materialize a device [b, k] id block as host int64, packing
        the transfer when beneficial (ops/bitpack: 32 -> ceil(log2 cap)
        bits per id; 1.9x fewer readback bytes at 100K rows)."""
        from embeddinghub_tpu.ops import bitpack

        b, k = int(idev.shape[0]), int(idev.shape[1])
        if self._pack_wire_ok(b, k):
            bits = bitpack.bits_for(self._cap)
            words = bitpack.pack_ids(idev.reshape(-1), bits=bits)
            return bitpack.unpack_ids(
                np.asarray(words), b * k, bits=bits
            ).reshape(b, k)
        return np.asarray(idev).astype(np.int64)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        mode: str = "auto",
        with_distances: bool = True,
        query_dtype: str | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched k-NN.

        ``mode``:
          * ``"exact"``  — streaming fused scan, recall 1.0;
          * ``"approx"`` — bf16 matmul + ``approx_max_k`` oversampled
            candidates + f32 rerank (TPU fast path, recall ~0.998);
          * ``"auto"``   — approx on accelerator backends for large
            indexes, exact otherwise.

        ``with_distances=False`` skips the distance readback (the
        serving NN path only needs row ids; host<->device bytes are the
        scarce resource).  ``query_dtype="bfloat16"`` halves the query
        upload at a tiny recall cost; ``"int8"`` quarters it (per-query
        scales, dequantized on device).
        """
        queries = as_f32_matrix(queries, self.dims)
        b = queries.shape[0]
        if self._size == 0 or k <= 0:
            return (
                np.full((b, max(k, 0)), np.inf, np.float32),
                np.full((b, max(k, 0)), -1, np.int64),
            )
        self._sync()
        kk = min(next_pow2(k, floor=1), self._cap)
        pb = _bucket(b)
        if pb > b:
            queries = np.concatenate(
                [queries, np.zeros((pb - b, self.dims), np.float32)]
            )
        deep = self._cap > _DEEP_CAP_THRESHOLD
        if self.storage_dtype in ("int8", "int8x2") or (
            deep and self.storage_dtype == "bfloat16"
        ):
            # quantized shards always use the int8 scoring path; int8x2
            # widens the candidate pool (its hi+lo rerank can actually
            # exploit a deep pool — plain int8's dequantized rerank
            # cannot resolve beyond int8 noise anyway)
            # pool = k*oversample candidates; sim (RESULTS.md): the hi+lo
            # rerank plateaus at ~256 pooled candidates even on
            # pathological near-duplicate clusters (phase-1 int8 ordering
            # on normalized rows is good; the rerank just needs the pool
            # to contain the true top-k).  oversample_boost is the
            # audit's HBM-free lever against deep pool containment.
            over = (
                16 if self.storage_dtype == "int8x2" else 8
            ) * self.oversample_boost
            q_dev = _upload_queries(queries, query_dtype)
            if deep:
                # Deep-scale: chunked scan keeps the intermediate at
                # [B, chunk] (a one-shot [B, cap] matrix would be tens
                # of GB at 10M-100M rows — BASELINE configs 4-5).  The
                # rerank is folded INTO the chunk scan: a whole-arena
                # rerank gather forces XLA to materialize a full-arena
                # relayout copy (12 GB at 100M x 96, the compile-OOM of
                # r4_cap100m.log) because the scan matmul and the gather
                # want different arena layouts.  Deep bf16 arenas route
                # here too (scales/lo = None): every other bf16 path
                # consumes the whole arena in one op, which at 10M+ rows
                # either OOMs the [B, cap] score matrix or re-materializes
                # the arena relayout.
                d, i = topk_ops.quantized_chunked_exact(
                    q_dev,
                    self._dx,
                    self._dscales,
                    self._dvalid,
                    self._dx_sq,
                    self._dx_lo,
                    metric=self.metric,
                    k=kk,
                    oversample=over,
                    chunk=self._deep_chunk(pb),
                    pool_budget=(1 << 17) * self.oversample_boost,
                )
            else:
                d, i = topk_ops.int8_oversample_search(
                    q_dev,
                    self._dx,
                    self._dscales,
                    self._dvalid,
                    self._dx_sq,
                    self._dx_lo,
                    metric=self.metric,
                    k=kk,
                    oversample=min(over, max(1, self._cap // max(kk, 1))),
                )
            if not with_distances:
                return np.zeros((b, k), np.float32), self._ids_to_host(
                    i[:b, :k]
                )
            d = np.asarray(d)[:b, :k]
            i = np.asarray(i)[:b, :k].astype(np.int64)
            i[~np.isfinite(d)] = -1
            return d, i
        if mode == "auto":
            use_approx = (
                jax.default_backend() != "cpu" and self._cap >= 4096
            )
        else:
            use_approx = mode == "approx"
        if use_approx and kk * 8 <= self._cap:
            q_dev = _upload_queries(queries, query_dtype)
            d, i = topk_ops.approx_oversample_search(
                q_dev,
                self._dx,
                self._dvalid,
                self._dx_sq,
                metric=self.metric,
                k=kk,
                oversample=8,
            )
            if not with_distances:
                # device-side slice + bit-pack so only ~b*k*bits/8
                # bytes cross the wire
                return np.zeros((b, k), np.float32), self._ids_to_host(
                    i[:b, :k]
                )
        elif jax.default_backend() != "cpu" and self._cap >= 1024:
            # exact fast path on accelerators: approx_max_k candidates +
            # fused count certificate; the ~0.6% of rows whose
            # certificate fails are re-answered exactly by a tiny
            # chunked re-scan (guaranteed recall 1.0 at a fraction of
            # the full per-chunk top_k sort; benchmarks/ondevice.py)
            d, i, ok = topk_ops.certified_topk_search(
                jnp.asarray(queries),
                self._dx,
                self._dvalid,
                self._dx_sq,
                k=kk,
                metric=self.metric,
                exact_matmul=True,
            )
            ok = np.asarray(ok)
            if not ok.all():
                d, i = np.asarray(d), np.asarray(i)
                bad = np.flatnonzero(~ok)
                nb = next_pow2(bad.size, floor=8)
                qs = np.zeros((nb, self.dims), np.float32)
                qs[: bad.size] = queries[bad]
                ds, is_ = topk_ops.chunked_topk_search(
                    jnp.asarray(qs),
                    self._dx,
                    self._dvalid,
                    self._dx_sq,
                    metric=self.metric,
                    k=kk,
                    chunk=min(self._cap, self._chunk_target),
                )
                d[bad] = np.asarray(ds)[: bad.size]
                i[bad] = np.asarray(is_)[: bad.size]
        else:
            chunk = min(self._cap, self._chunk_target)
            # honor query_dtype here too (narrow upload, op upcasts) —
            # keeps this path bit-identical with search_async's fallback
            d, i = topk_ops.chunked_topk_search(
                _upload_queries(queries, query_dtype),
                self._dx,
                self._dvalid,
                self._dx_sq,
                metric=self.metric,
                k=kk,
                chunk=chunk,
                compute_dtype=self.compute_dtype,
            )
        d = np.asarray(d)[:b, :k]
        i = np.asarray(i)[:b, :k].astype(np.int64)
        i[~np.isfinite(d)] = -1
        return d, i

    def search_async(
        self,
        queries: np.ndarray,
        k: int,
        query_dtype: str | None = "bfloat16",
    ):
        """Dispatch the fast-path (approx oversample) search and return
        the on-device id handle WITHOUT reading it back.  JAX dispatch is
        asynchronous, so issuing batch i+1 before materializing batch i
        overlaps its query upload with batch i's compute/readback over
        the host<->device link — on a wire-bound link this pipelining is
        where the remaining throughput lives (the serving QueryBatcher
        drains concurrent RPCs exactly this way).  Call
        ``np.asarray(handle)`` (or :func:`resolve_async`) to block and
        fetch; ids are device-sliced so only b*k int32 cross the wire.
        """
        queries = as_f32_matrix(queries, self.dims)
        b = queries.shape[0]
        if self._size == 0 or k <= 0:
            return np.full((b, max(k, 0)), -1, np.int64)
        self._sync()
        kk = min(next_pow2(k, floor=1), self._cap)
        pb = _bucket(b)
        if pb > b:
            queries = np.concatenate(
                [queries, np.zeros((pb - b, self.dims), np.float32)]
            )
        q_dev = _upload_queries(queries, query_dtype)
        deep = self._cap > _DEEP_CAP_THRESHOLD
        if self.storage_dtype in ("int8", "int8x2") or (
            deep and self.storage_dtype == "bfloat16"
        ):
            # quantized arenas MUST score through the int8 kernels —
            # the raw hi-plane fed to the f32 kernels (scales never
            # applied) ranks garbage (measured recall 0.26 vs 1.0)
            over = (
                16 if self.storage_dtype == "int8x2" else 8
            ) * self.oversample_boost
            if deep:
                _, i = topk_ops.quantized_chunked_exact(
                    q_dev, self._dx, self._dscales, self._dvalid,
                    self._dx_sq, self._dx_lo,
                    metric=self.metric, k=kk, oversample=over,
                    chunk=self._deep_chunk(pb),
                    pool_budget=(1 << 17) * self.oversample_boost,
                )
            else:
                _, i = topk_ops.int8_oversample_search(
                    q_dev, self._dx, self._dscales, self._dvalid,
                    self._dx_sq, self._dx_lo,
                    metric=self.metric, k=kk,
                    oversample=min(over, max(1, self._cap // max(kk, 1))),
                )
        elif kk * 8 <= self._cap and jax.default_backend() != "cpu":
            _, i = topk_ops.approx_oversample_search(
                q_dev,
                self._dx,
                self._dvalid,
                self._dx_sq,
                metric=self.metric,
                k=kk,
                oversample=8,
            )
        else:
            # reuse the already-uploaded narrow-dtype batch (the op
            # upcasts internally) — a second jnp.asarray(queries) paid
            # a redundant full-f32 upload on the wire-bound path
            _, i = topk_ops.chunked_topk_search(
                q_dev,
                self._dx,
                self._dvalid,
                self._dx_sq,
                metric=self.metric,
                k=kk,
                chunk=min(self._cap, self._chunk_target),
            )
        i = i[:b, :k]
        if self._pack_wire_ok(b, k):
            from embeddinghub_tpu.ops import bitpack

            bits = bitpack.bits_for(self._cap)
            return _PackedIds(
                bitpack.pack_ids(i.reshape(-1), bits=bits), b, k, bits
            )
        return i

    # ------------------------------------------------------------------ misc

    @property
    def size(self) -> int:
        return self._size

    @property
    def capacity(self) -> int:
        return self._cap

    def vector(self, row: int) -> np.ndarray:
        """The raw stored vector for a row, exactly as it was added."""
        return self._hx[row].copy()

    def vectors(self, rows: np.ndarray) -> np.ndarray:
        return self._hx[np.asarray(rows, dtype=np.int64)]

    # ----------------------------------------------------------- quant audit

    def _host_oracle(self, q: np.ndarray, k: int, block: int = 1 << 21):
        """Exact f32 top-k ids on the host arena (blocked matmul)."""
        qn = q
        if self.metric == "cosine":
            qn = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-30
            )
        best_s = np.full((len(q), k), -np.inf, np.float32)
        best_i = np.full((len(q), k), -1, np.int64)
        for s in range(0, self._cap, block):
            e = min(self._cap, s + block)
            blk = self._hx[s:e]
            if self.metric == "cosine":
                nrm = np.linalg.norm(blk, axis=1, keepdims=True)
                blk = blk / np.maximum(nrm, 1e-30)
                sc = qn @ blk.T
            else:
                sc = 2.0 * (qn @ blk.T) - np.einsum(
                    "nd,nd->n", blk, blk, dtype=np.float32
                )[None, :]
            sc = np.where(self._hvalid[None, s:e], sc, -np.inf)
            cat_s = np.concatenate([best_s, sc], axis=1)
            cat_i = np.concatenate(
                [best_i, np.broadcast_to(np.arange(s, e), sc.shape)], axis=1
            )
            top = np.argpartition(-cat_s, k - 1, axis=1)[:, :k]
            best_s = np.take_along_axis(cat_s, top, axis=1)
            best_i = np.take_along_axis(cat_i, top, axis=1)
        return best_i

    def audit_recall(
        self, nq: int = 64, k: int = 10, rng=None
    ) -> float:
        """Measured recall@k of the live device path against an exact
        host-oracle scan — the at-scale referee the sample-simulating
        quant guard cannot be.  The guard's 16k-row host simulation is
        blind to the *pool-containment* regime: at deep density the
        phase-1 int8 hi-plane ranking pushes true neighbors out of the
        k*oversample candidate pool, a failure that only turns on with
        the full row count (measured: 50M-row int8x2 arena served
        recall 0.794 while the 16k sample simulated >0.99;
        benchmarks/artifacts/r4_cap50m_b256.log).  Extrapolating the
        sample's impostor ranks linearly in N over-predicts the failure
        instead (it freezes the sample's top-k, but at scale the true
        top-k move up in score), so the only trustworthy signal is this
        direct measurement.  Cost: nq full-arena host matmuls
        (~30-150 s at 50M x 96) + one device search — next to a
        multi-minute quantize+upload.  Queries are live rows (the
        self-match appears in both rankings, so it cancels out of the
        comparison)."""
        q = self._audit_queries(nq, rng)
        if q is None:
            return 1.0
        return self._measured_recall(q, self._host_oracle(q, k), k)

    def _audit_queries(self, nq: int, rng=None) -> np.ndarray | None:
        live = np.flatnonzero(self._hvalid)
        if live.size == 0:
            return None
        rng = np.random.default_rng(0xA0D17) if rng is None else rng
        sel = rng.choice(live, size=min(nq, live.size), replace=False)
        return self._hx[sel]

    def _measured_recall(self, q: np.ndarray, want: np.ndarray, k: int) -> float:
        """Recall of the live device path against precomputed oracle ids
        (the oracle — nq full-arena host matmuls, ~30-150 s at 50M — is
        the expensive half; audit_and_escalate computes it ONCE and
        re-measures only this cheap device leg per escalation rung)."""
        self._sync()
        _, got = self.search(q, k, with_distances=False)
        got = np.asarray(got)
        return float(
            np.mean(
                [
                    len(set(got[i].tolist()) & set(want[i].tolist())) / k
                    for i in range(len(q))
                ]
            )
        )

    def _device_arena_bytes(self, dtype: str) -> int:
        per_row = {
            "float32": 4 * self.dims,
            "bfloat16": 2 * self.dims,
            "int8": self.dims + 4,      # + f32 row scale
            "int8x2": 2 * self.dims + 4,
        }[dtype]
        return self._cap * (per_row + 5)  # + f32 x_sq + valid

    def _drop_device_arena(self) -> None:
        """Free the device mirror NOW (not at GC time) so a re-upload in
        a wider dtype never holds both arenas alive — at 50M rows that
        double-residency alone exceeds HBM."""
        for name in ("_dx", "_dx_lo", "_dx_sq", "_dvalid", "_dscales"):
            a = getattr(self, name, None)
            if a is not None and hasattr(a, "delete"):
                a.delete()
            setattr(self, name, None)
        self._needs_full_sync = True

    # Pool-boost ladder cap: past 8x the stacked pool (n_chunks * kc
    # rows per query) stops fitting the [B, pool] stack comfortably and
    # the rerank FLOPs rival the scan — a wider dtype is cheaper then.
    _MAX_POOL_BOOST = 8

    def audit_and_escalate(
        self, bar: float = 0.95, nq: int = 64, k: int = 10
    ) -> dict:
        """Measure device recall against an exact host oracle (computed
        ONCE — it is nq full-arena matmuls, the expensive half at 50M+)
        and repair sub-``bar`` recall in cost order:

        1. **widen the phase-1 candidate pool** (``oversample_boost``
           x2 up to ``_MAX_POOL_BOOST``) on DEEP quantized arenas — the
           HBM-free fix for the pool-containment regime (true neighbors
           pushed out of the k*oversample pool by hi-plane noise at
           10M+ density; measured 0.794 at 50M int8x2,
           benchmarks/artifacts/r4_cap50m_b256.log);
        2. **escalate the storage dtype** (int8 -> int8x2 -> bfloat16
           -> float32) when width alone cannot fix ranking resolution —
           unless the wider arena would not fit HBM.

        This is the production-shape answer to quantization at deep
        scale: decide from the measured arena, not from a sample
        extrapolation.  Returns a report dict with every
        (dtype, boost, recall) audited and the levers pulled."""
        report: dict = {"audited": [], "escalated": [], "boosted": [],
                        "fit_blocked": None}
        q = self._audit_queries(nq)
        if q is None:
            return report
        want = self._host_oracle(q, k)
        while True:
            r = self._measured_recall(q, want, k)
            report["audited"].append({"storage": self.storage_dtype,
                                      "boost": self.oversample_boost,
                                      "recall": round(r, 4)})
            if r >= bar:
                break
            if (
                self._cap > _DEEP_CAP_THRESHOLD
                and self.storage_dtype in ("int8", "int8x2", "bfloat16")
                and self.oversample_boost < self._MAX_POOL_BOOST
            ):
                self.oversample_boost *= 2
                report["boosted"].append(self.oversample_boost)
                _log.warning(
                    "quant audit: measured device recall@%d %.3f < %.2f "
                    "at %d rows — widening phase-1 pool boost to %dx "
                    "(HBM-free) before considering a wider dtype",
                    k, r, bar, self._size, self.oversample_boost,
                )
                continue
            if self.storage_dtype not in _ESCALATION:
                break
            nxt = _ESCALATION[self.storage_dtype]
            need = self._device_arena_bytes(nxt)
            limit = None
            try:
                stats = self._device.memory_stats()
                if stats:
                    limit = stats.get("bytes_limit")
            except Exception:
                pass
            if limit and need > 0.95 * limit:
                _log.warning(
                    "quant audit: measured recall@%d %.3f < %.2f but a %s "
                    "arena needs %.1f GB > HBM limit %.1f GB — serving "
                    "stays on %s (degraded)",
                    k, r, bar, nxt, need / 1e9, limit / 1e9,
                    self.storage_dtype,
                )
                report["fit_blocked"] = nxt
                break
            _log.warning(
                "quant audit: measured device recall@%d %.3f < %.2f at "
                "%d rows — escalating storage %s -> %s and re-uploading",
                k, r, bar, self._size, self.storage_dtype, nxt,
            )
            self.storage_dtype = nxt
            self._guard_checked_size = self._size  # audit outranks guard
            report["escalated"].append(nxt)
            # wider dtype = better phase-1 ranking: restart the boost
            # ladder so serving doesn't permanently pay a pool width the
            # new dtype may not need
            self.oversample_boost = 1
            self._hq = None  # free the stale planes before requantizing
            self._drop_device_arena()
            self._sync()
        return report

    # -------------------------------------------------------------- snapshot

    _STORAGE_CODES = {"float32": 0, "bfloat16": 1, "int8": 2, "int8x2": 3}

    def state_arrays(self) -> dict[str, np.ndarray]:
        """Arrays to persist (see store/persistence.py).  The host arena
        is always f32 (quantization is a device-mirror concern), but the
        storage dtype must survive the roundtrip so a reloaded quantized
        space stays quantized.  flat_meta = [storage_code, pool_boost].

        When the quantized planes are row-accurate they are persisted
        too (``q_hi``/``q_lo``/``q_sq``/``q_sc``): restore then uploads
        them directly instead of re-quantizing the whole arena on one
        host core — the dominant term of the r4 203 s restore-at-10M
        (vs a 33 s snapshot, benchmarks/RESULTS.md)."""
        arrays = {
            "x": self._hx,
            "valid": self._hvalid,
            "flat_meta": np.asarray(
                [self._STORAGE_CODES.get(self.storage_dtype, 0),
                 self.oversample_boost],
                np.int32,
            ),
        }
        if (
            self.storage_dtype in ("int8", "int8x2")
            and self._hq_fresh()
            and not self._dirty_rows
        ):
            arrays["q_hi"] = self._hq["hi"]
            arrays["q_sq"] = self._hq["sq"]
            arrays["q_sc"] = self._hq["sc"]
            if self._hq["lo"] is not None:
                arrays["q_lo"] = self._hq["lo"]
        return arrays

    @classmethod
    def from_state(
        cls, dims: int, metric: str, arrays: dict[str, np.ndarray], **kw
    ) -> "FlatIndex":
        boost = 1
        if "flat_meta" in arrays:
            meta = np.asarray(arrays["flat_meta"]).ravel()
            if "storage_dtype" not in kw:
                codes = {v: k for k, v in cls._STORAGE_CODES.items()}
                kw = dict(kw, storage_dtype=codes[int(meta[0])])
            if meta.size > 1:
                boost = max(1, int(meta[1]))
        x, valid = arrays["x"], arrays["valid"]
        idx = cls(dims, metric=metric, capacity=x.shape[0], **kw)
        idx.oversample_boost = boost
        # Adopt the loaded arrays in place of the freshly-zeroed arenas
        # when shapes line up: load_version hands copy-on-write memmaps,
        # so a multi-GB restore pages lazily off disk instead of
        # materializing + copying the whole arena up front.
        if x.shape == idx._hx.shape and x.dtype == np.float32 and x.flags.writeable:
            idx._hx = x
        else:
            idx._hx[: x.shape[0]] = x
        if (
            valid.shape == idx._hvalid.shape
            and valid.dtype == np.bool_
            and valid.flags.writeable
        ):
            idx._hvalid = valid
        else:
            idx._hvalid[: valid.shape[0]] = valid
        idx._size = int(np.count_nonzero(idx._hvalid))
        if (
            "q_hi" in arrays
            and "q_sq" in arrays
            and "q_sc" in arrays
            and idx.storage_dtype in ("int8", "int8x2")
            and arrays["q_hi"].shape == (idx._cap, idx.dims)
            and (idx.storage_dtype != "int8x2" or "q_lo" in arrays)
        ):
            idx._hq = {
                "dtype": idx.storage_dtype,
                "hi": arrays["q_hi"],
                "lo": arrays.get("q_lo"),
                "sq": arrays["q_sq"],
                "sc": arrays["q_sc"],
            }
        idx._needs_full_sync = True
        return idx


def _bucket(b: int) -> int:
    for s in _BATCH_BUCKETS:
        if b <= s:
            return s
    return next_pow2(b, floor=_BATCH_BUCKETS[-1])
