"""HNSWIndex — hnswlib-semantic graph index in array form.

Parity anchor for the reference's ANN engine (hnswlib
``HierarchicalNSW`` behind ``embeddingstore/index.cc:12-15``, pinned
defaults M=16 / efConstruction=200 / ef=10).  Same algorithmic
skeleton — geometric level assignment, greedy upper-layer descent,
ef-bounded best-first search on layer 0, neighbor-selection heuristic
with reciprocal links — but restructured for TPU:

  * the graph is flat int32 neighbor tables (``[cap, 2M]`` layer 0,
    compact ``[n_l, M]`` upper layers), not linked lists;
  * queries run through ONE fused device dispatch (upper-layer greedy
    descent + layer-0 beam, :mod:`embeddinghub_tpu.ops.wave_insert`);
  * construction inserts in **waves**: beyond a tiny bootstrap
    threshold the ENTIRE wave — candidate search, forward heuristic
    selection, reciprocal link commit with overflow pruning, vector
    scatter — executes as one jitted device step on donated state
    (``ops/wave_insert.make_wave_commit``).  Candidates come from a
    masked flat MXU scan, not a graph walk: exact-quality pools at
    ~1000x the beam's insert throughput (the graph stays hnswlib-
    faithful for serving).  The device link tables are then
    authoritative; the host mirror syncs down lazily (``_sync_host``)
    for snapshots / updates / removes.  Wave inserts don't see their
    wave siblings at search time; waves are capped to a fraction of the
    current graph so the quality effect stays negligible.

Use this engine when the per-chip row count is large enough that a full
scan loses to a graph walk, or for hnswlib-parity recall sweeps; for
HBM-resident sizes the Flat engines are both faster and exact.
"""

from __future__ import annotations

import math
import os as _os

import numpy as np
import jax
import jax.numpy as jnp

from embeddinghub_tpu.index.base import Index, as_f32_matrix, next_pow2
from embeddinghub_tpu.ops import beam as beam_ops
from embeddinghub_tpu.ops import distance as dist_ops


def _vlog(msg: str) -> None:
    """Build-phase progress prints, enabled by EHTPU_VERBOSE=1 (bulk
    builds at 1M+ rows run for minutes behind remote dispatch; silent
    phases are undebuggable when the tunnel worker wedges)."""
    import os as _os
    import time as _time

    if _os.environ.get("EHTPU_VERBOSE"):
        print(f"  [hnsw +{_time.time() % 1e5:.0f}s] {msg}", flush=True)

_BUCKETS = (1, 8, 64, 256, 1024)

import functools


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _delta_apply(x, x_sq, valid, levels, nb0,
                 vrows, vvecs, vsq, vvalid, vlev, nrows, nvals):
    """Fused dirty-row scatter into the resident device graph state."""
    return (
        x.at[vrows].set(vvecs),
        x_sq.at[vrows].set(vsq),
        valid.at[vrows].set(vvalid),
        levels.at[vrows].set(vlev),
        nb0.at[nrows].set(nvals),
    )


def _bucket(b: int) -> int:
    for s in _BUCKETS:
        if b <= s:
            return s
    return next_pow2(b, floor=_BUCKETS[-1])


class HNSWIndex(Index):
    def __init__(
        self,
        dims: int,
        metric: str = "l2",
        m: int = 16,
        ef_construction: int = 200,
        ef_search: int = 10,
        capacity: int = 1024,
        expand: int = 8,
        seed: int = 100,
        refine_rounds: int = 3,
    ):
        if metric not in dist_ops.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        self.dims = int(dims)
        self.metric = metric
        self.m = int(m)
        self.m0 = 2 * self.m
        self.ef_construction = int(ef_construction)
        self.ef_search = int(ef_search)
        self.expand = int(expand)
        # Serving-walk shape knobs (ops/beam.beam_search): spec=2 covers
        # two graph hops per loop iteration (one merge top-k, one loop
        # carry — the iteration-overhead-bound regime's lever), exit_k
        # stops once the top exit_k pool entries are converged instead
        # of all ef (serving reads only k).  0 = off = hnswlib
        # semantics (index.cc:41-51).
        self.spec = 1
        self.exit_k = 0
        # Fused walk arena (ops/beam.augment_arena): the serving walk
        # gathers ONE [N, D+2] bf16 row per candidate instead of three
        # arrays (x, x_sq, valid) — TPU gathers cost per-index, so the
        # two scalar gathers were ~60% of the hop's fetch time (r5
        # measured: 1.9 + 2.2 ms vs 2.5 ms for the vectors themselves
        # at B=1024, E*M=256).  The k rows the caller reads are
        # re-scored against the exact f32 arena in the same dispatch.
        # "off" restores the classic three-gather walk.
        self.walk_dtype = _os.environ.get("EHTPU_WALK_DTYPE", "bfloat16")
        # Packed-neighbor walk (ops/beam.pack_neighbors): each hop
        # gathers E block rows (the expanded nodes' neighbor vectors,
        # contiguous int8) instead of E*M scattered rows — 2.6x serving
        # QPS at 1M (11.8k vs 4.5k on-device, recall bar held via the
        # exact rerank).  Costs m0*D bytes/node HBM and a ~25 s pack
        # per graph mutation epoch — read-heavy/frozen serving only,
        # so opt-in (env EHTPU_WALK_PACKED=1 or index.walk_packed).
        self.walk_packed = bool(int(
            _os.environ.get("EHTPU_WALK_PACKED", "0")
        ))
        self.refine_rounds = int(refine_rounds)
        # bulk-build tuning knobs (semantics-preserving; see _bulk_refine)
        self.refine_expand = 32
        self.refine_hops = 32
        self.nnd_iters = 4
        # Exact-scan construction: below this row count the layer-0
        # candidate pools come from exact chunked MXU scans (n^2 * d
        # bf16 FLOPs — seconds up to ~2M rows/chip) instead of
        # NN-descent + graph-walk refinement; the pool hnswlib's
        # ef_construction beam *approximates* is computed exactly, so
        # the iterative refinement rounds collapse away.
        self.exact_build_max = 2_000_000
        self.exact_refine_rounds = 0
        # Hybrid bulk build: above `exact_full_max` rows, exact-scan
        # construct only a `stream_base`-row core and stream the rest
        # through the fused wave-insert path (ops/wave_insert.py) in
        # `max_wave`-row waves.  Measured at 1M (SIFT-proxy, M=16,
        # efC=200; benchmarks/RESULTS.md): the r2c device-side exact
        # build (pooled approx_max_k fwd pools + on-device symmetrize)
        # reaches recall@10 0.961 @ef100 in 358 s COLD (~210 s warm) —
        # above the 0.95 parity bar, the CPU gold graph (0.9529), and
        # 3.8x faster than the single-thread CPU build (1372 s) — so
        # exact construction is the default through `exact_build_max`
        # (2M); the hybrid stream (recall 0.9193 @ef100 at 1M) takes
        # over beyond.  4096-row waves are the measured throughput AND
        # quality sweet spot (larger waves cost within-wave
        # self-blindness).
        self.stream_base = 65_536
        self.max_wave = 4_096
        # Cluster-routed construction (> exact_build_max rows): k-means
        # partitions the arena (ops/kmeans.py); each node's candidate
        # pool comes from an exact scan of its own + `cluster_probes`-1
        # nearest clusters' members only — O(n * probes * target * d)
        # instead of the exact build's O(n^2 * d), with the identical
        # heuristic selection / symmetrize / upper-layer machinery
        # downstream.  This is the sub-quadratic scaling path past 2M
        # rows/chip (VERDICT r2 item 1).
        self.cluster_build_max = 64_000_000
        self.cluster_target = 4_096   # rows per cluster ≈ query block
        self.cluster_probes = 8       # clusters scanned per pool
        # Post-routing repair.  Graph-walk refine rounds (_bulk_refine)
        # were the r3 default but are GATHER-bound: ~460 s per 262k rows
        # per round at 1M on the real chip (TPU row gathers run ~25 GB/s
        # while the MXU scans at ~80 TFLOP/s).  Boundary repair instead
        # re-pools only the lowest-routing-margin rows with an exact
        # full-arena MXU scan (refine(rows)) — the rows whose routed
        # pools can actually be wrong — at O(frac · n²·d / wave) scan
        # cost and zero gathers.  cluster_refine_rounds stays as an
        # opt-in extra.
        # Defaults tuned from the measured 1M force-cluster sweep
        # (RESULTS.md r4): probes=4/repair=0.25 -> 0.9301 @ef100,
        # probes=8/repair=0.25 -> 0.9402, probes=8/repair=0.5 ->
        # 0.9635 — above both the 0.95 bar and the exact build's own
        # 0.9610, at ~1.1x its warm wall-clock.
        self.cluster_repair_frac = 0.5
        self.cluster_refine_rounds = 0  # opt-in graph-walk repair
        # `exact_full_max` is the BULK-construction ceiling: up to here
        # a cold add() builds the whole arena in one bulk pass (exact
        # scans through `exact_build_max`, cluster-routed beyond); past
        # it only a `stream_base` core is bulk-built and the remainder
        # streams through fused waves.
        self.exact_full_max = self.cluster_build_max
        # Post-stream refine sweep for hybrid (>exact_full_max) builds
        # (see refine()).  Off by default: a full-graph refine costs the
        # same n^2-scan work as the exact build, so below
        # `exact_build_max` one should just build exactly; it exists as
        # a repair tool after heavy streaming churn.
        self.stream_refine = False
        self._mult = 1.0 / math.log(self.m)
        self._rng = np.random.default_rng(seed)

        self._cap = next_pow2(max(capacity, 128), floor=128)
        self._hx = np.zeros((self._cap, self.dims), np.float32)   # raw
        self._hvalid = np.zeros((self._cap,), bool)
        self._levels = np.full((self._cap,), -1, np.int32)
        # layer 0 dense; upper layers: {layer: {node: list[int]}} on host,
        # compacted to arrays on device sync
        self._nb0 = np.full((self._cap, self.m0), -1, np.int32)
        self._upper: dict[int, dict[int, list[int]]] = {}
        self._entry = -1
        self._max_level = -1
        self._size = 0
        self._device_state = None  # None = full rebuild on next use
        # Dirty-row tracking for incremental device sync: streaming
        # inserts scatter only changed rows into the resident device
        # arrays instead of re-uploading the whole graph per wave
        # (VERDICT r1 item 4; the reference's analog is hnswlib's
        # in-place addPoint, version.cc:47-56 -> index.cc:20-37).
        self._dirty_vec: set[int] = set()
        self._dirty_nb0: set[int] = set()
        self._dirty_upper: dict[int, set[int]] = {}
        # Fused insert path (r2): once the graph outgrows the tiny
        # threshold, whole waves commit in ONE jitted device step
        # (ops/wave_insert.py) and the DEVICE link tables become
        # authoritative; the host mirror (_nb0/_upper) goes stale until
        # _sync_host downloads it (snapshot / remove / update paths).
        self._host_stale = False
        self._wave_fn = None
        # exact host mirror of the device member-arena counts (see
        # _build_members_host / _insert_wave_fused regrowth check)
        self._mcount_host = np.zeros(0, np.int64)
        self._gs_fns: dict[tuple, object] = {}
        # centroid-routed multi-entry search (build_route): 0 = classic
        # single-entry descent search
        self.seed_probes = 0
        # >0: build_route fires automatically once size crosses
        # auto_route_min, and refreshes when the index doubles past the
        # route's build size (store knob EMBEDDINGHUB_HNSW_SEED_PROBES)
        self.auto_seed_probes = 0
        self.auto_route_min = 1 << 20

    # ---------------------------------------------------------------- helpers

    def _prep(self, v: np.ndarray) -> np.ndarray:
        if self.metric == "cosine":
            n = np.linalg.norm(v, axis=-1, keepdims=True)
            return v / np.maximum(n, 1e-30)
        return v

    def _dist(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Host-side distances a [*, D] vs b [*, D] -> [*] (matches kernel
        conventions: squared l2 / 1-dot on preprocessed vectors)."""
        if self.metric == "l2":
            return ((a - b) ** 2).sum(-1)
        return 1.0 - (a * b).sum(-1)

    def _assign_level(self) -> int:
        return int(-math.log(max(self._rng.random(), 1e-12)) * self._mult)

    # ------------------------------------------------------------------ write

    def add(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        vecs = as_f32_matrix(vecs, self.dims)
        if rows.size == 0:
            return
        self._ensure_capacity(int(rows.max()) + 1)
        raw = vecs.copy()
        prepped = self._prep(vecs)

        updates = self._hvalid[rows]
        if updates.any():
            # hnswlib re-addPoint on an existing label relinks the point;
            # we take the simple correct route: rebuild links for those
            # rows by removing + reinserting.
            for r in rows[updates]:
                self._unlink(int(r))
        self._size += int(np.count_nonzero(~updates))

        order = np.argsort(rows)  # deterministic
        pending = rows[order]
        praw = raw[order]
        pvecs = prepped[order]

        def commit_host(lo, hi, mark_dirty):
            # Host arena/valid commit is PER WAVE, not up front: the
            # fused wave kernel pools candidates against the pre-wave
            # `valid` mask, and committing every pending row before the
            # loop leaked future-wave rows (valid but link-less) into
            # earlier waves' device arenas — siblings became candidates
            # and reciprocal edges written onto future rows were later
            # clobbered by their own forward commit.
            w_rows = pending[lo:hi]
            self._hx[w_rows] = praw[lo:hi]
            self._hvalid[w_rows] = True
            if mark_dirty:
                # host-path waves rely on the delta flush for the
                # device copy; the fused kernel scatters its own rows
                self._dirty_vec.update(int(r) for r in w_rows)

        bulk_streamed = False
        if self._graph_size() == 0 and len(pending) >= 2048:
            # Bulk path: exact-scan graph construction — fully batched on
            # device, no sequential insertion.  Above `exact_full_max`
            # rows only a `stream_base` core is built this way; the
            # remainder streams through the fused wave path below (same
            # exact masked-scan candidate pools, linear instead of
            # quadratic scan cost).
            base = len(pending)
            if base > self.exact_full_max:
                base = self.stream_base
                bulk_streamed = True
            commit_host(0, base, mark_dirty=True)
            self._bulk_build(pending[:base], pvecs[:base])
            self._invalidate_device()
            route = getattr(self, "_cluster_route", None)
            if route and route.pop("fresh", False) \
                    and self.cluster_repair_frac > 0:
                # boundary repair: exact full-arena pools for the rows
                # whose routed pools were neighborhood-limited (see
                # cluster knobs above) — the cluster path's default
                # post-pass, replacing gather-bound graph-walk refine
                b_rows = self.cluster_boundary_rows()
                _vlog(f"boundary repair: {b_rows.size} rows")
                if b_rows.size:
                    self.refine(b_rows)
            self._hi_water = max(
                self._scan_hi_water(), int(rows.max()) + 1
            )
            pending, praw, pvecs = (
                pending[base:], praw[base:], pvecs[base:]
            )
            if len(pending) == 0:
                return

        # wave-based insert: never insert more than half the current
        # graph at once so wave siblings don't degrade link quality, and
        # never more than `max_wave` at once (within-wave rows don't see
        # each other during candidate search)
        tiny = max(4 * self.ef_construction, 512)
        i = 0
        while i < len(pending):
            built = max(self._graph_size(), 8)
            wave = min(len(pending) - i, max(8, built), self.max_wave)
            fused = built > tiny
            commit_host(i, i + wave, mark_dirty=not fused)
            if fused:
                # fused path: the whole wave commits in one device step
                self._insert_wave_fused(
                    pending[i : i + wave], pvecs[i : i + wave]
                )
            else:
                self._insert_wave(
                    pending[i : i + wave], pvecs[i : i + wave]
                )
            i += wave

        # NOTE: a post-stream "upper-layer polish" (global exact rebuild
        # of the upper layers after the wave loop) was measured at 1M
        # and REJECTED: the wave-built upper links are already
        # heuristic-selected per wave and score slightly better
        # (recall@10 0.9193 vs 0.9047 @ef100) at a fraction of the cost.
        # The hybrid/exact quality gap lives in layer-0 commit ordering,
        # not the upper stack (benchmarks/RESULTS.md, 1M section) — which
        # is exactly what the refine pass below repairs.
        if bulk_streamed and self.stream_refine:
            self.refine()
        # all add paths (bulk, host waves, fused waves) end here
        self._hi_water = max(self._scan_hi_water(), int(rows.max()) + 1)

    def refine(self, rows: np.ndarray | None = None) -> None:
        """Layer-0 repair sweep: re-select the given rows' forward links
        from near-exact pools over the FULL current arena, then
        re-symmetrize the whole layer globally — the batched analog of
        hnswlib's "re-insert every point into the finished graph" trick.
        Levels, entry point and upper layers are preserved.

        Use after heavy streaming churn (or a hybrid >exact_full_max
        build with ``stream_refine`` enabled).  NOTE: a *sequential*
        group-commit refine (re-running the wave kernel per group) was
        measured WORSE than no refine (0.9104 vs 0.9375 @ef64 on 6k
        CPU): each re-committed row loses its accumulated reciprocal
        edges and only later groups re-add in-edges, decimating average
        degree.  The global symmetrize below is what made the r2a
        refinement work (0.93 -> 0.9967 @ef100 at 50k)."""
        from embeddinghub_tpu.ops import nn_descent as nnd
        from embeddinghub_tpu.ops import topk as topk_ops

        self._sync_host()
        if rows is None:
            rows = np.flatnonzero(self._levels >= 0)
        rows = np.asarray(rows, np.int64).ravel()
        rows = rows[self._hvalid[rows]]
        if rows.size == 0 or self._graph_size() == 0:
            return
        state = self._device_arrays()
        xd, xsqd, validd = state["x"], state["x_sq"], state["valid"]
        cap = self._cap
        pool_k = min(
            next_pow2(self.ef_construction, floor=64), cap
        )
        # current lists seed the un-refined rows; dead rows contribute
        # no edges to the global symmetrize
        fwd = jnp.where(
            jnp.asarray(self._hvalid)[:, None], jnp.asarray(self._nb0), -1
        )
        for s in range(0, len(rows), self.max_wave):
            grp = rows[s : s + self.max_wave]
            w = len(grp)
            bw = next_pow2(w, floor=256 if w > 64 else 8)
            qv = np.zeros((bw, self.dims), np.float32)
            qv[:w] = self._prep(self._hx[grp].astype(np.float32))
            # padding rows REPEAT row 0 (same rule as wave_insert):
            # their scatter slots duplicate grp[0], and duplicate writes
            # are only safe when every copy carries the identical
            # payload — zero-vector pads selected zero-query garbage
            # links and clobbered grp[0] on ragged tail groups
            qv[w:] = qv[0]
            qd = jnp.asarray(qv)
            ids_b = topk_ops.pooled_topk_ids(
                qd, xd, validd, xsqd,
                metric=self.metric if self.metric != "cosine" else "ip",
                k=min(pool_k, cap),
                chunk=min(cap, 1 << 16),
            )
            grp_p = np.full((bw,), grp[0], np.int64)
            grp_p[:w] = grp
            ids_b = jnp.where(
                ids_b == jnp.asarray(grp_p, jnp.int32)[:, None], -1, ids_b
            )
            sel = nnd.heuristic_prune(
                xd, xsqd, ids_b,
                m_keep=self.m0, metric=self.metric, cand_k=int(ids_b.shape[1]),
                q=qd, q_sq=jnp.einsum("wd,wd->w", qd, qd),
            )
            fwd = fwd.at[jnp.asarray(grp_p)].set(sel[:, : self.m0])
            if (s // self.max_wave) % 8 == 7:
                # bounded in-flight depth: sustained unsynced full-arena
                # dispatches wedge the tunneled TPU worker (same pacing
                # rule as _exact_build_fwd)
                np.asarray(fwd[0, 0])
                _vlog(f"refine pool {s + w}/{len(rows)}")
        nb0 = self._symmetrize_device(
            fwd, xd, xsqd, cap, cap
        )
        dead = ~self._hvalid
        nb0[dead] = -1
        nb0[(nb0 >= 0) & dead[np.clip(nb0, 0, cap - 1)]] = -1
        self._nb0[:] = nb0
        state["nb0"] = jnp.asarray(nb0)
        state.pop("xa", None)  # refine rewrote links/liveness
        state.pop("xp", None)
        self._host_stale = False

    def cluster_boundary_rows(self, frac: float | None = None) -> np.ndarray:
        """Global row ids of the lowest-routing-margin rows from the
        last cluster-routed build — the rows whose candidate pools were
        restricted to a probed neighborhood that their true neighbors
        may straddle (ops/kmeans.boundary_margins).  Feed to
        :meth:`refine` for exact boundary repair; that pair is the
        cluster path's default post-pass (add())."""
        route = getattr(self, "_cluster_route", None)
        if not route:
            return np.empty(0, np.int64)
        from embeddinghub_tpu.ops import kmeans as km

        frac = self.cluster_repair_frac if frac is None else frac
        rows = route["rows"]
        n = rows.size
        take = int(n * max(0.0, min(1.0, frac)))
        if take == 0:
            return np.empty(0, np.int64)
        # device-resident arena, gathered into build order (no wire
        # cost; re-uploading 4M x 128 f32 would pay ~2 GB on the tunnel)
        xd = self._device_arrays()["x"][jnp.asarray(rows)]
        margins = km.boundary_margins(
            xd, jnp.asarray(route["cent"]), route["assign"],
            route["probes"],
        )
        order = np.argsort(margins, kind="stable")[:take]
        return rows[order]

    # ------------------------------------------------------------- bulk build

    def _bulk_build(self, rows: np.ndarray, pvecs: np.ndarray) -> None:
        """Bulk construction: NN-descent kNN graph + batched heuristic
        prune for layer 0; upper layers via exact kNN among each level's
        (geometrically shrinking) node subset.  Search semantics are
        identical to the incremental path."""
        import jax.numpy as jnp

        from embeddinghub_tpu.ops import nn_descent as nnd
        from embeddinghub_tpu.ops import topk as topk_ops

        n = len(rows)
        block = 2048 if n < 32768 else 4096
        # Pad to a multiple of the scan chunk as well as the query block:
        # the exact-build scan needs padded % chunk == 0, and a ragged
        # size forces chunk down to `block` (245x245 tiny scan steps at
        # 1M rows — approx_max_k overhead dominates).  64k is a multiple
        # of both block sizes.
        grain = block if n < (1 << 16) else (1 << 16)
        padded = -(-n // grain) * grain
        x = np.empty((padded, self.dims), np.float32)
        x[:n] = pvecs
        if padded > n:
            if self.metric == "l2":
                # far-offset pad rows never enter real neighbor lists
                x[n:] = pvecs[0] + 1e4
            else:
                rngp = np.random.default_rng(1)
                pad = rngp.standard_normal((padded - n, self.dims))
                x[n:] = pad / np.linalg.norm(pad, axis=1, keepdims=True)

        xd = jnp.asarray(x)
        xsq = jnp.einsum("nd,nd->n", xd, xd)

        if n <= self.exact_build_max:
            # Exact-scan construction: each node's candidate pool is its
            # exact top-efC neighbor set from a chunked MXU scan — the
            # pool hnswlib's ef_construction beam approximates, computed
            # exactly, with forward selection and symmetrize+overflow-
            # prune identical to the incremental path.  No NN-descent,
            # no graph-walk refinement (both were gather/iteration bound).
            fwd = self._exact_build_fwd(xd, xsq, n, padded, block)
            nb_local = self._symmetrize_device(fwd, xd, xsq, n, padded)
            if self.exact_refine_rounds:
                save = self.refine_rounds
                self.refine_rounds = self.exact_refine_rounds
                try:
                    nb_local = self._bulk_refine(xd, xsq, nb_local, n, padded)
                finally:
                    self.refine_rounds = save
        elif n <= self.cluster_build_max:
            # Cluster-routed construction: near-exact pools from scans
            # restricted to each node's k-means neighborhood — the same
            # selection/symmetrize downstream, sub-quadratic scan cost.
            # Routed pools miss cross-boundary neighbors (measured
            # 0.83 @ef100 at 131k/3% coverage, RESULTS.md); the graph
            # refine rounds (beam re-search of every node on the built
            # graph, also sub-quadratic) recover them.
            fwd = self._cluster_build_fwd(xd, xsq, n, padded)
            self._cluster_route["rows"] = rows.astype(np.int64)
            _vlog("symmetrize")
            nb_local = self._symmetrize_device(fwd, xd, xsq, n, padded)
            if self.cluster_refine_rounds:
                _vlog(f"refine x{self.cluster_refine_rounds}")
                save = self.refine_rounds
                self.refine_rounds = self.cluster_refine_rounds
                try:
                    nb_local = self._bulk_refine(xd, xsq, nb_local, n, padded)
                finally:
                    self.refine_rounds = save
            _vlog("layer0 done")
        else:
            m0 = min(self.m0, 32)
            nb = nnd.nn_descent(
                xd, xsq, m=m0, iters=self.nnd_iters, block=block,
                metric=self.metric,
            )
            # symmetrize: forward ++ reverse-sample candidates, then prune
            # (wider candidate enrichment measured WORSE here: diversity
            # crowds the nearest neighbors out of the M0 slots)
            ids = jnp.arange(padded, dtype=jnp.int32)
            rev = jnp.full((padded, m0), -1, jnp.int32)
            for j in range(m0):
                rev = rev.at[nb[:, j], j].set(ids)
            cand = jnp.concatenate([nb, rev], axis=1)
            pruned = nnd.heuristic_prune(
                xd, xsq, cand, m_keep=self.m0, metric=self.metric,
                cand_k=2 * m0,
            )
            nb_local = np.asarray(pruned).astype(np.int32)
            nb_local[n:] = -1
            nb_local = np.where(nb_local >= n, -1, nb_local)  # drop pads

            # Refinement: re-search every node against the current graph
            # with ef=ef_construction and re-select links — the batched
            # equivalent of hnswlib re-inserting every point into the
            # *finished* graph.  Supplies the medium-range "search path"
            # edges the narrow NN-descent pools lack (0.93 -> 0.99 on
            # SIFT-like; see benchmarks/graph_quality.py).
            nb_local = self._bulk_refine(xd, xsq, nb_local, n, padded)

        # Connectivity insurance: random long-range edges into FREE
        # slots only (never overwriting selected links).  NN-descent on
        # clustered data can converge to per-cluster islands; hnswlib
        # avoids this implicitly via insertion-order long edges.
        rng_e = np.random.default_rng(7)
        n_rand = min(3, self.m0 - 1)
        deg = (nb_local[:n] >= 0).sum(1)
        rand_local = rng_e.integers(0, n, size=(n, n_rand)).astype(np.int32)
        rand_local[rand_local == np.arange(n, dtype=np.int32)[:, None]] = -1
        cols = deg[:, None] + np.arange(n_rand)[None, :]
        ok = (cols < self.m0) & (rand_local >= 0)
        rows_i = np.repeat(np.arange(n), n_rand).reshape(n, n_rand)
        nb_local[rows_i[ok], cols[ok]] = rand_local[ok]

        # local (position) ids -> global row ids; padding/-1 dropped
        local_to_row = rows.astype(np.int64)
        valid = (nb_local[:n] >= 0) & (nb_local[:n] < n)
        mapped = np.where(
            valid, local_to_row[np.clip(nb_local[:n], 0, n - 1)], -1
        )
        self._nb0[rows] = mapped.astype(np.int32)

        # levels + upper layers
        levels = np.asarray([self._assign_level() for _ in range(n)], np.int32)
        self._levels[rows] = levels
        self._build_upper_layers(rows, pvecs, levels)

    def _build_upper_layers(
        self, rows: np.ndarray, pvecs: np.ndarray, levels: np.ndarray
    ) -> None:
        """(Re)build every upper layer from exact blocked kNN pools +
        heuristic selection + reciprocal symmetrization, and set the
        entry point.  Overwrites ``self._upper`` entries for ``rows``;
        used by the bulk build and as the hybrid build's final polish
        (wave-streamed upper links are per-wave local; this global pass
        restores gold-parity routing — measured at 1M it is the
        difference between recall@10 0.92 and 0.96 @ef100)."""
        import jax.numpy as jnp

        from embeddinghub_tpu.ops import topk as topk_ops

        local_to_row = rows.astype(np.int64)
        top = int(levels.max(initial=0))
        for layer in range(1, top + 1):
            members = np.flatnonzero(levels >= layer)
            gids = local_to_row[members]
            if members.size <= 1:
                for g in gids:
                    self._upper.setdefault(layer, {})[int(g)] = []
                continue
            sub = pvecs[members]
            # round the sub-arena up to the next POW2: a ragged cap
            # forces the chunk size down to its largest power-of-2
            # divisor (62592 members -> schunk 128 -> 489 sequential
            # chunk steps per block at 1M rows), and pow2 bucketing also
            # bounds the number of distinct (cap, width) shapes the
            # per-layer device symmetrize/prune kernels compile for —
            # upper-layer member counts vary per dataset and each new
            # shape costs a fresh remote jit on this tunnel
            cap = max(128, next_pow2(members.size, floor=128))
            subx = np.zeros((cap, self.dims), np.float32)
            subx[: members.size] = sub
            svalid = np.zeros(cap, bool)
            svalid[: members.size] = True
            sxd = jnp.asarray(subx)
            ssq = jnp.einsum("nd,nd->n", sxd, sxd)
            # query in blocks: a one-shot [members, members] score
            # matrix OOMs at 1M rows (layer-1 has ~n/m members -> 16 GB
            # f32 at 62k x 62k); chunk both axes instead
            qblk = min(next_pow2(members.size, floor=8), 4096)
            schunk = min(cap, 1 << 16)
            while cap % schunk:
                schunk //= 2
            i_parts = []
            kpool = min(next_pow2(4 * self.m, floor=32), schunk)
            for s in range(0, members.size, qblk):
                qpad = np.zeros((qblk, self.dims), np.float32)
                qpad[: min(qblk, members.size - s)] = sub[s : s + qblk]
                i_b = topk_ops.pooled_topk_ids(
                    jnp.asarray(qpad),
                    sxd,
                    jnp.asarray(svalid),
                    ssq,
                    metric=self.metric if self.metric != "cosine" else "ip",
                    k=kpool,
                    chunk=schunk,
                )
                i_parts.append(i_b)  # stays on device
            # hnswlib applies the selection heuristic and reciprocal
            # linking on upper layers too (addPoint runs the same
            # mutuallyConnectNewElement per layer).  Raw kNN lists stay
            # fine while a layer is sparse, but at ~60k layer-1 members
            # (1M rows) they turn myopic — all M links point into one
            # local blob, greedy descent stalls in cluster-local minima
            # and hands layer 0 a far-off entry (measured: median entry/
            # true-NN distance ratio 2.1, p90 10x, recall@10 0.83
            # @ef100).  Diversify exactly like layer 0: heuristic-select
            # M from the top-4M pool, then symmetrize with overflow-only
            # pruning at width M — pools and links device-resident
            # (pooled approx_max_k + gather_reciprocal), same machinery
            # as layer 0.
            i_ = jnp.concatenate(i_parts)[: members.size]
            pool = jnp.concatenate([
                i_,
                jnp.full((cap - members.size, kpool), -1, jnp.int32),
            ])
            rows_j = jnp.arange(cap, dtype=pool.dtype)[:, None]
            pool = jnp.where(
                (pool == rows_j) | (rows_j >= members.size), -1, pool
            )
            from embeddinghub_tpu.ops import nn_descent as nnd

            fwd = nnd.heuristic_prune(
                sxd, ssq, pool,
                m_keep=self.m, metric=self.metric, cand_k=kpool,
            )
            fwd = jnp.where(
                (fwd >= members.size) | (rows_j[: fwd.shape[0]] >= members.size),
                -1,
                fwd,
            )
            sym = self._symmetrize_device(
                fwd, sxd, ssq, members.size, cap, width=self.m,
            )
            layer_map = self._upper.setdefault(layer, {})
            for j, g in enumerate(gids):
                neigh = [
                    int(local_to_row[members[t]])
                    for t in sym[j]
                    if 0 <= t < members.size and t != j
                ]
                layer_map[int(g)] = neigh
        # entry point = (a) node of the top level
        top_nodes = np.flatnonzero(levels == top)
        self._entry = int(local_to_row[top_nodes[0]])
        self._max_level = top

    # ------------------------------------------------- cluster-routed build

    def _cluster_build_fwd(self, xd, xsqd, n: int, padded: int):
        """Forward link lists from cluster-routed near-exact pools.

        Past ``exact_build_max`` the O(n²·d) exact scan stops paying
        (RESULTS.md: 1M fwd ≈ 125-275 s; 4M would be ~16x).  Instead:

          1. k-means the arena into ~``n/cluster_target`` clusters
             (sampled Lloyd on the MXU, ops/kmeans.py);
          2. each cluster's members become query blocks whose candidate
             arena is the concatenation of the ``cluster_probes``
             nearest clusters' members (a fixed-size gathered scan:
             [block, S] score matmul + approx_max_k + the standard
             heuristic selection) — pools are exact *within the probed
             neighborhood*;
          3. the symmetrize + overflow-prune + upper-layer machinery is
             shared with the exact build unchanged.

        Total scan cost O(n · probes · cluster_target · d) — linear in
        n at fixed neighborhood size.  Boundary nodes whose true
        neighbors fall outside the probed clusters get weaker pools;
        :meth:`cluster_boundary_rows` + :meth:`refine` give the
        lowest-routing-margin ``cluster_repair_frac`` of rows exact
        full-arena pools afterwards.  Measured (r4, 1M force-cluster,
        probes=8 repair=0.5): recall@10 0.9635 @ef100 — above the 0.95
        parity bar and above the exact build's own 0.9610
        (RESULTS.md "Cluster-routed construction" section).
        No reference analog: hnswlib builds sequentially point-by-point
        (index.cc:20-37); this is the TPU-shaped equivalent of its
        ef_construction candidate search, routed instead of walked.
        Returns a DEVICE [padded, m0] int32 array (-1 beyond n)."""
        import os as _os
        import time as _time

        from embeddinghub_tpu.ops import kmeans as km
        from embeddinghub_tpu.ops import nn_descent as nnd

        verbose = bool(_os.environ.get("EHTPU_VERBOSE"))

        def vlog(msg):
            if verbose:
                print(f"  [cluster_build +{_time.time()-_t0:.0f}s] {msg}",
                      flush=True)

        _t0 = _time.time()
        target = self.cluster_target
        qb = min(target, 4096)
        k = max(16, next_pow2(max(1, n // target), floor=16))
        vlog(f"kmeans fit: k={k} n={n}")
        cent = km.fit_kmeans(
            xd, k, iters=8, seed=11, limit=n,
            sample=min(n, max(1 << 18, 64 * k)),
        )
        cent.block_until_ready()
        vlog("assign_clusters")
        assign = km.assign_clusters(xd, cent)[:n]
        probes = km.probe_order(cent)[:, : max(self.cluster_probes, 1)]
        # stash routing state: boundary-node repair
        # (cluster_boundary_rows) ranks nodes by how close the first
        # UNPROBED centroid sits vs their own — those are the nodes
        # whose routed pools may have missed true cross-boundary
        # neighbors
        self._cluster_route = {
            "cent": np.asarray(cent, np.float32),
            "assign": np.asarray(assign, np.int32),
            "probes": np.asarray(probes, np.int32),
            "fresh": True,
        }
        vlog("block planning")

        # host-side block planning: cluster-sorted members, per-cluster
        # candidate arenas from the probe list
        order = np.argsort(assign, kind="stable").astype(np.int32)
        sorted_assign = assign[order]
        starts = np.searchsorted(sorted_assign, np.arange(k))
        ends = np.searchsorted(sorted_assign, np.arange(k), side="right")
        members = [order[starts[c]:ends[c]] for c in range(k)]

        S = next_pow2(self.cluster_probes * target, floor=qb)
        q_blocks, c_blocks = [], []
        # truncation accounting (exposed for tests/diagnostics): a probe
        # list longer than the S-wide arena is cut probe-tail-first
        # (own cluster rides at the front via probe_order's self-first
        # sort), and an own cluster larger than S loses even own-cluster
        # candidates — the regime VERDICT r3 flagged as untested
        self._cluster_stats = stats = {
            "clusters": 0, "truncated": 0, "own_truncated": 0,
            "dropped_cands": 0, "total_cands": 0, "S": int(S),
        }
        for c in range(k):
            mem = members[c]
            if mem.size == 0:
                continue
            stats["clusters"] += 1
            cand = np.concatenate([members[p] for p in probes[c]])
            stats["total_cands"] += int(cand.size)
            if cand.size >= S:
                stats["truncated"] += int(cand.size > S)
                stats["dropped_cands"] += int(cand.size - S)
                if mem.size > S:
                    stats["own_truncated"] += 1
                    # an oversized own cluster must not lose its own
                    # members to an arbitrary id-order prefix cut:
                    # spread the cut uniformly so every region of the
                    # cluster keeps representation in the arena
                    own_keep = max(S // 2, S - qb)
                    cand = np.concatenate([
                        mem[np.linspace(0, mem.size - 1, own_keep)
                            .astype(np.int64)],
                        cand[mem.size:],
                        np.full(S, -1, np.int32),  # pad if probes empty
                    ])[:S]
                else:
                    cand = cand[:S]
            else:
                cand = np.concatenate(
                    [cand, np.full(S - cand.size, -1, np.int32)]
                )
            for s in range(0, mem.size, qb):
                blk = mem[s : s + qb]
                if blk.size < qb:
                    blk = np.concatenate(
                        [blk, np.full(qb - blk.size, blk[0], np.int32)]
                    )
                q_blocks.append(blk)
                c_blocks.append(cand)
        q_blocks = np.stack(q_blocks).astype(np.int32)
        c_blocks = np.stack(c_blocks).astype(np.int32)
        n_blocks = q_blocks.shape[0]

        pool_k = min(next_pow2(self.ef_construction, floor=64), S)
        metric = self.metric if self.metric != "cosine" else "ip"
        m0, prune_metric = self.m0, self.metric

        @functools.partial(jax.jit, donate_argnums=(2,))
        def cluster_fwd(xd, xsqd, fwd, qids_g, cids_g):
            def step(fwd, inp):
                qids, cids = inp
                qv = xd[qids]
                qsq = xsqd[qids]
                safe_c = jnp.where(cids >= 0, cids, 0)
                cv = xd[safe_c]
                csq = xsqd[safe_c]
                dots = jax.lax.dot_general(
                    qv.astype(jnp.bfloat16),
                    cv.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = 2.0 * dots - csq[None, :] if metric == "l2" else dots
                s = jnp.where(cids[None, :] < 0, -jnp.inf, s)
                s = jnp.where(cids[None, :] == qids[:, None], -jnp.inf, s)
                vals, loc = jax.lax.approx_max_k(s, pool_k)
                ids_b = jnp.where(
                    jnp.isfinite(vals), jnp.take(cids, loc), -1
                ).astype(jnp.int32)
                sel = nnd.heuristic_prune(
                    xd, xsqd, ids_b,
                    m_keep=m0, metric=prune_metric, cand_k=pool_k,
                    q=qv, q_sq=qsq,
                )
                return fwd.at[qids].set(sel[:, :m0]), None

            fwd, _ = jax.lax.scan(step, fwd, (qids_g, cids_g))
            return fwd

        fwd = jnp.full((padded, m0), -1, jnp.int32)
        # grouped dispatch with a sync point per group — same TPU-worker
        # pacing rule as _exact_build_fwd (one giant dispatch crashed
        # the relay worker at 1M)
        group = min(n_blocks, 8)
        vlog(f"routed scan: {n_blocks} blocks of {qb} (S={S}), "
             f"group={group}")
        for g0 in range(0, n_blocks, group):
            gi = np.minimum(
                g0 + np.arange(group, dtype=np.int64), n_blocks - 1
            )
            fwd = cluster_fwd(
                xd, xsqd, fwd,
                jnp.asarray(q_blocks[gi]), jnp.asarray(c_blocks[gi]),
            )
            np.asarray(fwd[0, 0])  # true sync point (worker pacing)
            if verbose and (g0 // group) % 8 == 0:
                vlog(f"scan {min(g0 + group, n_blocks)}/{n_blocks}")
        vlog("routed scan done")
        real = (jnp.arange(padded, dtype=jnp.int32) < n)[:, None]
        return jnp.where(real & (fwd < n), fwd, -1)

    # ----------------------------------------------------- exact-scan build

    def _exact_build_fwd(
        self, xd, xsqd, n: int, padded: int, block: int
    ) -> np.ndarray:
        """Forward link lists from exact top-efC pools.  ONE jitted
        ``lax.scan`` over query blocks — per block an exact chunked MXU
        scan (n^2 * d bf16 FLOPs total) + the standard heuristic
        selection at M0 width — so the whole forward build is a single
        device dispatch + one readback (the per-block eager version paid
        ~6 tunnel RTTs x n/4096 blocks).  Returns a DEVICE [padded, m0]
        int32 array of local ids (-1 beyond n)."""
        from embeddinghub_tpu.ops import nn_descent as nnd
        from embeddinghub_tpu.ops import topk as topk_ops

        chunk = min(1 << 16, padded)
        while padded % chunk:
            chunk //= 2
        # pow2 pool: self-exclusion masks one slot, so the pool keeps >=
        # efC-1 real candidates (lane-aligned widths; a 257-wide pool
        # forces a ragged selection shape for no recall gain)
        pool_k = min(
            next_pow2(self.ef_construction, floor=64), chunk, padded
        )
        metric = self.metric if self.metric != "cosine" else "ip"
        n_blocks = -(-n // block)
        m0, prune_metric = self.m0, self.metric
        # Blocks dispatch in bounded groups with a synchronous readback
        # between groups: one giant fused dispatch at 1M rows (245
        # blocks, ~75 s device time) crashed the TPU worker behind the
        # relay, and so did 16 back-to-back ~5 s dispatches (sustained
        # occupancy starves the worker); each component runs fine in
        # isolation.  Small groups + a sync point per group keep the
        # worker healthy and the extra RTTs are noise.
        group = min(n_blocks, 8)

        @functools.partial(jax.jit, static_argnums=())
        def exact_fwd(xd, xsqd, validd, starts):
            def step(_, s):
                qv = jax.lax.dynamic_slice_in_dim(xd, s, block)
                qsq = jax.lax.dynamic_slice_in_dim(xsqd, s, block)
                # pooled approx_max_k selection: chunked_topk_search's
                # per-tile [block, chunk] top_k SORTS dominated build
                # device time (~4x total wall-clock at 256k-1M; the
                # matmuls are ~ms) — the near-exact pooled pick keeps
                # the same candidate quality for link selection at a
                # fraction of the cost (measured recall unchanged,
                # 256k build 302 -> 65.5 s warm together with the
                # device symmetrize; benchmarks/RESULTS.md)
                ids_b = topk_ops.pooled_topk_ids(
                    qv, xd, validd, xsqd,
                    metric=metric, k=pool_k, chunk=chunk,
                ).astype(jnp.int32)
                self_col = s + jnp.arange(block, dtype=jnp.int32)[:, None]
                ids_b = jnp.where(ids_b == self_col, -1, ids_b)
                sel = nnd.heuristic_prune(
                    xd, xsqd, ids_b,
                    m_keep=m0, metric=prune_metric, cand_k=pool_k,
                    q=qv, q_sq=qsq,
                )
                return None, sel[:, :m0]

            _, sels = jax.lax.scan(step, None, starts)
            return sels

        validd = jnp.zeros((padded,), bool).at[:n].set(True)
        parts = []
        for g0 in range(0, n_blocks, group):
            starts = (g0 + np.arange(group, dtype=np.int32)) * block
            # pad the tail group by repeating its last block (rows
            # recomputed, result identical; keeps ONE compiled shape)
            starts = np.minimum(starts, (n_blocks - 1) * block)
            sels = exact_fwd(xd, xsqd, validd, jnp.asarray(starts))
            # scalar readback = true sync point per group (worker pacing;
            # block_until_ready under-reports through the relay)
            np.asarray(sels[0, 0, 0])
            parts.append(sels.reshape(group * block, m0))
        fwd = jnp.concatenate(parts)[: n_blocks * block]
        if padded > fwd.shape[0]:
            fwd = jnp.concatenate([
                fwd,
                jnp.full((padded - fwd.shape[0], m0), -1, jnp.int32),
            ])
        # stays ON DEVICE: the symmetrize pass consumes it directly and
        # only the final [padded, m0] table crosses the wire once
        real = (jnp.arange(padded, dtype=jnp.int32) < n)[:, None]
        return jnp.where(real & (fwd < n), fwd, -1)

    # ---------------------------------------------------------- bulk refine

    def _bulk_refine(
        self, xd, xsqd, nb_local: np.ndarray, n: int, padded: int
    ) -> np.ndarray:
        """Vamana-style refinement rounds over the layer-0 graph (local id
        space).  Per round: (1) beam-search every node on the current
        graph from a medoid entry with ef=ef_construction — the same
        candidate pool hnswlib's ``addPoint`` sees (``searchBaseLayer``'s
        final ef heap); (2) heuristic-select forward links at full M0
        width; (3) re-symmetrize reciprocal edges, heuristic-pruning only
        overflowing rows (hnswlib ``prune_node`` semantics)."""
        from embeddinghub_tpu.ops import nn_descent as nnd

        if self.refine_rounds <= 0 or n < 8:
            return nb_local
        m0 = self.m0
        ef_final = min(self.ef_construction, 512)
        # Escalating ef schedule: early rounds only improve the graph's
        # *structure* (their pool feeds the next round's search), so a
        # small pool suffices; only the final round needs the full
        # hnswlib-equal ef_construction pool for link selection.
        schedule = [min(64, ef_final)] * (self.refine_rounds - 1) + [ef_final]
        validd = jnp.zeros((padded,), bool).at[:n].set(True)

        # medoid of the live rows as the search entry (Vamana's choice;
        # plays the role of hnswlib's top-layer entry point)
        xh = np.asarray(xd[:n])
        mean = xh.mean(0)
        if self.metric == "l2":
            entry_local = int(((xh - mean) ** 2).sum(1).argmin())
        else:
            entry_local = int((xh @ mean).argmax())

        bq = 4096 if n >= 4096 else next_pow2(n, floor=8)
        ids_self = np.arange(n, dtype=np.int32)
        for rnd, ef in enumerate(schedule):
            _vlog(f"refine round {rnd + 1}/{len(schedule)} ef={ef}")
            nbd = jnp.asarray(nb_local)
            # device-pipelined search with BOUNDED in-flight depth: a
            # small sync every `pace` blocks.  Queueing every block of a
            # 1M-row round (245 beam while_loops) wedged the tunneled
            # TPU worker the same way one giant dispatch did in
            # _exact_build_fwd — pacing costs a few RTTs, a hang costs
            # the build.
            blocks = []
            pace = 8
            for bi, s in enumerate(range(0, n, bq)):
                e = min(s + bq, n)
                q = np.broadcast_to(xh[s], (bq, self.dims)).copy()
                q[: e - s] = xh[s:e]
                _, idsb = beam_ops.beam_search(
                    jnp.asarray(q),
                    jnp.full((bq,), entry_local, jnp.int32),
                    nbd,
                    xd,
                    xsqd,
                    validd,
                    metric=self.metric,
                    ef=ef,
                    expand=self.refine_expand,
                    max_hops=self.refine_hops,
                )
                blocks.append(idsb)
                if (bi + 1) % pace == 0:
                    np.asarray(idsb[0, 0])  # true sync (worker pacing)
                    if (bi + 1) % (8 * pace) == 0:
                        _vlog(f"  refine search {e}/{n}")
            found = np.asarray(jnp.concatenate(blocks, axis=0))[:n]
            cand = np.full((padded, ef + m0), -1, np.int32)
            cand[:n, :ef] = found
            cand[:n, ef:] = nb_local[:n]
            cand[:n][cand[:n] == ids_self[:, None]] = -1
            pruned = np.asarray(
                nnd.heuristic_prune(
                    xd,
                    xsqd,
                    jnp.asarray(cand),
                    m_keep=m0,
                    metric=self.metric,
                    cand_k=ef + m0,
                )
            ).astype(np.int32)
            pruned[n:] = -1
            # device symmetrize (semantics identical to the host
            # version; the numpy edge bookkeeping costs ~30 s per 256k
            # rows on the single-core VM — minutes per round at 1M+)
            nb_local = self._symmetrize_device(
                jnp.asarray(pruned), xd, xsqd, n, padded
            )
        return nb_local

    def _symmetrize_device(
        self, fwd_dev, xd, xsqd, n: int, padded: int,
        width: int | None = None,
    ) -> np.ndarray:
        """Device-resident symmetrize: reciprocal-edge gather + dedup in
        one jitted dispatch (``ops/nn_descent.gather_reciprocal``), then
        hnswlib overflow-only pruning in bounded row groups (worker
        pacing, like ``_exact_build_fwd``).  Semantics identical to
        ``_symmetrize_local``; the host version's numpy edge bookkeeping
        cost ~30 s at 256k rows on the single-core VM, this is ~100 ms
        of device time plus the prune groups."""
        from embeddinghub_tpu.ops import nn_descent as nnd

        m0 = self.m0 if width is None else int(width)
        cap_in = 3 * m0
        validd = jnp.zeros((padded,), bool).at[:n].set(True)
        comb, fits = nnd.gather_reciprocal(fwd_dev, validd, cap_in=cap_in)
        out = np.full((padded, m0), -1, np.int32)
        group_rows = 8 * 4096
        for s in range(0, padded, group_rows):
            e = min(padded, s + group_rows)
            pruned = nnd.heuristic_prune(
                xd, xsqd, comb[s:e],
                m_keep=m0, metric=self.metric, cand_k=m0 + cap_in,
                q=xd[s:e], q_sq=xsqd[s:e],
            )
            merged = jnp.where(fits[s:e, None], comb[s:e, :m0], pruned)
            out[s:e] = np.asarray(merged)
        out[n:] = -1
        out[:n] = np.where(out[:n] >= n, -1, out[:n])
        return out

    def _symmetrize_local(
        self, fwd: np.ndarray, xd, xsqd, n: int, padded: int,
        width: int | None = None,
    ) -> np.ndarray:
        """Add reciprocal edges to the forward-pruned lists.  Rows that
        stay within the layer link width keep every edge un-re-pruned
        (hnswlib only prunes a neighbor list when it overflows);
        overflowing rows go through one batched heuristic prune over
        (current ∪ incoming).  ``width`` defaults to M0 (layer 0); upper
        layers pass M."""
        from embeddinghub_tpu.ops import nn_descent as nnd

        m0 = self.m0 if width is None else int(width)
        F = fwd[:n]
        flat = F.ravel()
        ve = flat >= 0
        src = np.repeat(np.arange(n, dtype=np.int32), m0)[ve]
        dst = flat[ve]
        indeg = np.bincount(dst, minlength=n)
        cap = 3 * m0
        order = np.argsort(dst, kind="stable")
        gd, gs = dst[order], src[order]
        starts = np.zeros(n + 1, np.int64)
        starts[1:] = np.cumsum(indeg)
        pos = np.arange(len(gd)) - starts[gd]
        keep = pos < cap
        rev = np.full((n, cap), -1, np.int32)
        rev[gd[keep], pos[keep].astype(np.int64)] = gs[keep]

        comb = np.concatenate([F, rev], axis=1)
        comb = np.sort(comb, axis=1)[:, ::-1]  # valid ids first, -1 last
        comb[:, 1:][comb[:, 1:] == comb[:, :-1]] = -1
        comb = np.sort(comb, axis=1)[:, ::-1]  # re-compact after dedup
        count = (comb >= 0).sum(1)

        out = np.full((padded, m0), -1, np.int32)
        fits = count <= m0
        out[:n][fits] = comb[fits, :m0]
        ovr = np.flatnonzero(~fits)
        if ovr.size:
            bq = next_pow2(ovr.size, floor=8)
            cm = np.full((bq, m0 + cap), -1, np.int32)
            cm[: ovr.size] = comb[ovr]
            qv = np.zeros((bq, self.dims), np.float32)
            xh = np.asarray(xd[:n])
            qv[: ovr.size] = xh[ovr]
            qsq = np.einsum("bd,bd->b", qv, qv)
            pruned = np.asarray(
                nnd.heuristic_prune(
                    xd,
                    xsqd,
                    jnp.asarray(cm),
                    m_keep=m0,
                    metric=self.metric,
                    cand_k=m0 + cap,
                    q=jnp.asarray(qv),
                    q_sq=jnp.asarray(qsq),
                )
            ).astype(np.int32)
            out[ovr] = pruned[: ovr.size]
        return out

    def _graph_size(self) -> int:
        return int(np.count_nonzero(self._levels >= 0))

    def _ensure_capacity(self, need: int) -> None:
        if need <= self._cap:
            return
        # pull device-authoritative links down at the OLD capacity before
        # the host mirror is resized (fused-insert path)
        self._sync_host()
        new_cap = next_pow2(need, floor=self._cap)
        for name, fill in (("_hx", 0), ("_hvalid", False), ("_levels", -1)):
            old = getattr(self, name)
            shape = (new_cap,) + old.shape[1:]
            grown = np.full(shape, fill, dtype=old.dtype)
            grown[: self._cap] = old
            setattr(self, name, grown)
        nb0 = np.full((new_cap, self.m0), -1, np.int32)
        nb0[: self._cap] = self._nb0
        self._nb0 = nb0
        self._cap = new_cap
        self._invalidate_device()

    def remove(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.int64).ravel()
        for r in rows:
            r = int(r)
            if 0 <= r < self._cap and self._hvalid[r]:
                self._unlink(r)
                self._hvalid[r] = False
                self._size -= 1
                self._dirty_vec.add(r)  # valid-mask delta

    def _unlink(self, r: int) -> None:
        """Remove r from the graph (drop its links + reciprocal links)."""
        self._sync_host()  # host mirror may lag the fused insert path
        peers = self._nb0[r]
        for p in peers[peers >= 0]:
            lst = self._nb0[p]
            lst[lst == r] = -1
            self._dirty_nb0.add(int(p))
        self._nb0[r] = -1
        self._dirty_nb0.add(r)
        lvl = int(self._levels[r])
        for layer in range(1, lvl + 1):
            nodes = self._upper.get(layer, {})
            mine = nodes.pop(r, [])
            dirty = self._dirty_upper.setdefault(layer, set())
            dirty.add(r)
            for p in mine:
                if p in nodes:
                    nodes[p] = [y for y in nodes[p] if y != r]
                    dirty.add(int(p))
        self._levels[r] = -1
        if r == self._entry:
            self._pick_new_entry()

    def _pick_new_entry(self) -> None:
        self._entry, self._max_level = -1, -1
        live = np.flatnonzero(self._levels >= 0)
        if live.size:
            lv = self._levels[live]
            j = int(np.argmax(lv))
            self._entry = int(live[j])
            self._max_level = int(lv[j])

    # ----------------------------------------------------- fused insert wave

    def _insert_wave_fused(self, rows: np.ndarray, pvecs: np.ndarray) -> None:
        """One-dispatch wave commit (ops/wave_insert.py): search, forward
        selection, reciprocal links and the vector scatter all execute in
        a single jitted step on donated device state.  No readback — the
        host link mirror goes stale (``_sync_host`` downloads on demand).
        Waves pipeline over the tunnel: throughput is bound by the vector
        upload + device step, not by round trips (~25 RTTs in r2)."""
        from embeddinghub_tpu.ops import wave_insert

        levels = np.asarray([self._assign_level() for _ in rows], np.int32)
        old_max = self._max_level
        new_max = max(old_max, int(levels.max(initial=0)))

        # the kernel scatters the wave's vectors itself
        self._dirty_vec.difference_update(int(r) for r in rows)
        state = self._device_arrays()

        # grow the upper stack first if this wave raises max_level (the
        # new layers start empty; this wave links only up to old_max,
        # matching hnswlib: a level-raising node becomes entry with no
        # links at its new layers until a peer arrives)
        ustack = state["ustack"]
        members, mcount = state["members"], state["mcount"]
        if new_max > ustack.shape[0]:
            pad = jnp.full(
                (new_max - ustack.shape[0], self._cap, self.m), -1, jnp.int32
            )
            ustack = jnp.concatenate([ustack, pad], axis=0)
            grow = new_max - members.shape[0]
            members = jnp.concatenate([
                members,
                jnp.full((grow, members.shape[1]), -1, jnp.int32),
            ])
            mcount = jnp.concatenate(
                [mcount, jnp.zeros((grow,), jnp.int32)]
            )
            self._mcount_host = np.concatenate(
                [self._mcount_host, np.zeros((grow,), np.int64)]
            )
        # regrow the member slabs if this wave's appends could overflow
        # (exact check: the host mirror tracks the device counts 1:1)
        L_now = int(members.shape[0])
        if L_now:
            adds = np.array([
                int((levels >= layer).sum())
                for layer in range(1, L_now + 1)
            ], np.int64)
            S_now = int(members.shape[1])
            if (self._mcount_host[:L_now] + adds > S_now).any():
                new_S = S_now
                need = int((self._mcount_host[:L_now] + adds).max())
                while new_S < need:
                    new_S *= 2
                members = jnp.concatenate([
                    members,
                    jnp.full((L_now, new_S - S_now), -1, jnp.int32),
                ], axis=1)

        w = len(rows)
        bw = next_pow2(w, floor=256 if w > 64 else 8)
        rows_p = np.full((bw,), rows[0], np.int64)
        rows_p[:w] = rows
        vecs_p = np.broadcast_to(pvecs[0], (bw, self.dims)).copy()
        vecs_p[:w] = pvecs
        lev_p = np.full((bw,), int(levels[0]), np.int32)
        lev_p[:w] = levels
        lt0 = int(min(levels[0], max(old_max, 0)))
        lt_p = np.full((bw,), lt0, np.int32)
        lt_p[:w] = np.minimum(levels, max(old_max, 0))
        wvalid = np.zeros((bw,), bool)
        wvalid[:w] = True

        if self._wave_fn is None:
            self._wave_fn = wave_insert.make_wave_commit(
                metric=self.metric,
                m=self.m,
                m0=self.m0,
                ef_construction=self.ef_construction,
            )
        (
            state["x"], state["x_sq"], state["valid"],
            state["levels"], state["nb0"], new_ustack,
            state["members"], state["mcount"],
        ) = self._wave_fn(
            state["x"], state["x_sq"], state["valid"], state["levels"],
            state["nb0"], ustack, members, mcount,
            jnp.asarray(rows_p, jnp.int32),
            jnp.asarray(vecs_p),
            jnp.asarray(np.einsum("wd,wd->w", vecs_p, vecs_p)),
            jnp.asarray(lev_p),
            jnp.asarray(lt_p),
            jnp.asarray(wvalid),
            jnp.int32(self._scan_hi_water()),
        )
        self._hi_water = max(
            self._scan_hi_water(), int(rows.max()) + 1
        )
        state["ustack"] = new_ustack
        state.pop("xa", None)  # walk arenas are stale after a wave
        state.pop("xp", None)
        # mirror the device-side member appends exactly (same masks)
        for layer in range(1, int(new_ustack.shape[0]) + 1):
            self._mcount_host[layer - 1] += int((levels >= layer).sum())
        self._host_stale = True

        # host bookkeeping: levels / entry / max_level stay host-accurate
        for j, r in enumerate(rows):
            r = int(r)
            lvl = int(levels[j])
            self._levels[r] = lvl
            if lvl > self._max_level:
                self._entry, self._max_level = r, lvl

    def _sync_host(self) -> None:
        """Download the device link tables into the host mirror (the
        fused insert path leaves the host stale).  Needed before host
        graph surgery (updates/removes) and snapshots."""
        if not self._host_stale or self._device_state is None:
            self._host_stale = False
            return
        state = self._device_state
        self._nb0[:] = np.asarray(state["nb0"])
        ustack = np.asarray(state["ustack"])
        self._upper = {}
        for layer in range(1, ustack.shape[0] + 1):
            nodes = np.flatnonzero(self._levels >= layer)
            tbl = ustack[layer - 1]
            self._upper[layer] = {
                int(nd): [int(v) for v in tbl[nd] if v >= 0]
                for nd in nodes
            }
        self._host_stale = False

    # ------------------------------------------------------------ insert wave

    def _insert_wave(self, rows: np.ndarray, pvecs: np.ndarray) -> None:
        levels = np.asarray([self._assign_level() for _ in rows], np.int32)

        if self._entry < 0:
            # bootstrap: first node becomes the entry point
            first = int(rows[0])
            self._levels[first] = levels[0]
            self._entry, self._max_level = first, int(levels[0])
            for layer in range(1, levels[0] + 1):
                self._upper.setdefault(layer, {})[first] = []
                self._dirty_upper.setdefault(layer, set()).add(first)
            rows, pvecs, levels = rows[1:], pvecs[1:], levels[1:]
            if len(rows) == 0:
                return

        # --- batched candidate search against the current graph ---
        searched_max = self._max_level  # layers covered by the search
        cand_ids, cand_d = self._search_candidates(
            pvecs, self.ef_construction, levels
        )

        # --- batched device link commit: one prune dispatch per layer
        # for the wave's forward links and one for the reciprocal
        # re-prunes (replaces per-node host heuristic loops) ---
        self._commit_wave_links(rows, pvecs, levels, searched_max, cand_ids)
        for j, r in enumerate(rows):
            r = int(r)
            lvl = int(levels[j])
            self._levels[r] = lvl
            for layer in range(self._max_level + 1, lvl + 1):
                self._upper.setdefault(layer, {})[r] = []
                self._dirty_upper.setdefault(layer, set()).add(r)
            if lvl > self._max_level:
                self._entry, self._max_level = r, lvl
        # next wave must search the graph including this wave's links;
        # the delta flush in _device_arrays scatters only dirty rows

    def _commit_wave_links(
        self, rows, pvecs, levels, searched_max, cand_ids
    ) -> None:
        import jax.numpy as jnp

        from embeddinghub_tpu.ops import nn_descent as nnd

        state = self._device_arrays()
        q_sq_all = np.einsum("wd,wd->w", pvecs, pvecs)
        top = min(int(levels.max(initial=0)), searched_max)

        # ---- ONE forward-selection prune across every (node, layer) ----
        # hnswlib selects M forward links per layer with the same
        # heuristic regardless of layer, so all layers batch into a
        # single device dispatch (each extra dispatch costs a tunnel
        # round trip).
        pairs: list[tuple[int, int]] = []  # (layer, j)
        for layer in range(top, -1, -1):
            for j in range(len(rows)):
                if min(int(levels[j]), searched_max) >= layer:
                    pairs.append((layer, j))
        if not pairs:
            return
        bp = next_pow2(len(pairs), floor=256 if len(pairs) > 64 else 8)
        cw = 128
        ids_p = np.full((bp, cw), -1, np.int32)
        q_p = np.zeros((bp, self.dims), np.float32)
        qsq_p = np.zeros((bp,), np.float32)
        for i, (layer, j) in enumerate(pairs):
            ids = cand_ids[layer][j]
            take = min(cw, len(ids))
            ids_p[i, :take] = ids[:take]
            q_p[i] = pvecs[j]
            qsq_p[i] = q_sq_all[j]
        pruned = np.asarray(
            nnd.heuristic_prune(
                state["x"],
                state["x_sq"],
                jnp.asarray(ids_p),
                m_keep=self.m,
                metric="ip" if self.metric != "l2" else "l2",
                cand_k=cw,
                q=jnp.asarray(q_p),
                q_sq=jnp.asarray(qsq_p),
            )
        )[: len(pairs)]

        # ---- host bookkeeping: forward links + reciprocal grouping ----
        overflow: dict[int, list[tuple[int, list[int]]]] = {0: [], 1: []}
        for layer in range(top, -1, -1):
            mmax = self.m0 if layer == 0 else self.m
            recip: dict[int, list[int]] = {}
            for i, (lyr, j) in enumerate(pairs):
                if lyr != layer:
                    continue
                r = int(rows[j])
                sel = pruned[i][pruned[i] >= 0]
                self._set_links(r, layer, sel)
                for t in sel:
                    recip.setdefault(int(t), []).append(r)
            for t, new_ns in recip.items():
                cur = self._links_of(t, layer)
                if len(cur) + len(new_ns) <= mmax:
                    self._set_links(
                        t, layer, np.asarray(cur + new_ns, np.int64)
                    )
                else:
                    overflow[1 if layer else 0].append(
                        (layer, t, (cur + new_ns)[: 2 * mmax])
                    )

        # ---- grouped overflow re-prunes: one dispatch per mmax class ----
        for cls, items in overflow.items():
            if not items:
                continue
            mmax = self.m if cls else self.m0
            tcount = len(items)
            tp = next_pow2(tcount, floor=256 if tcount > 64 else 8)
            width = next_pow2(2 * mmax, floor=8)
            cm = np.full((tp, width), -1, np.int32)
            targets = np.asarray([t for _, t, _ in items])
            for i, (_, _, cand) in enumerate(items):
                cm[i, : len(cand)] = cand
            tvecs = self._prep(self._hx[targets])
            tv_p = np.zeros((tp, self.dims), np.float32)
            tv_p[:tcount] = tvecs
            tsq_p = np.zeros((tp,), np.float32)
            tsq_p[:tcount] = np.einsum("td,td->t", tvecs, tvecs)
            pruned_t = np.asarray(
                nnd.heuristic_prune(
                    state["x"],
                    state["x_sq"],
                    jnp.asarray(cm),
                    m_keep=mmax,
                    metric="ip" if self.metric != "l2" else "l2",
                    cand_k=width,
                    q=jnp.asarray(tv_p),
                    q_sq=jnp.asarray(tsq_p),
                )
            )[:tcount]
            for i, (layer, t, _) in enumerate(items):
                sel = pruned_t[i][pruned_t[i] >= 0]
                self._set_links(t, layer, sel)

    def _links_of(self, node: int, layer: int) -> list[int]:
        if layer == 0:
            lst = self._nb0[node]
            return [int(v) for v in lst[lst >= 0]]
        return list(self._upper.get(layer, {}).get(node, []))

    def _search_candidates(self, pvecs, ef, levels):
        """For each wave vector, beam-search every layer it links on.
        Returns {layer: (ids [W, ef], d [W, ef])} built with numpy host
        search for tiny graphs and device beam search otherwise."""
        w = len(pvecs)
        out_ids = {}
        out_d = {}
        gsize = self._graph_size()
        if gsize <= max(4 * self.ef_construction, 512):
            # tiny graph: exact host search over live nodes per layer
            for layer in range(0, self._max_level + 1):
                nodes = self._layer_nodes(layer)
                if nodes.size == 0:
                    out_ids[layer] = np.full((w, ef), -1, np.int64)
                    out_d[layer] = np.full((w, ef), np.inf, np.float32)
                    continue
                nv = self._prep(self._hx[nodes])
                if self.metric == "l2":
                    dmat = (
                        (pvecs[:, None, :] - nv[None, :, :]) ** 2
                    ).sum(-1)
                else:
                    dmat = 1.0 - pvecs @ nv.T
                kk = min(ef, nodes.size)
                part = np.argsort(dmat, axis=1)[:, :kk]
                ids = nodes[part]
                dd = np.take_along_axis(dmat, part, axis=1)
                pad = ef - kk
                if pad:
                    ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                    dd = np.pad(
                        dd, ((0, 0), (0, pad)), constant_values=np.inf
                    )
                out_ids[layer] = ids
                out_d[layer] = dd
            return out_ids, out_d

        # unreachable: add() routes graphs beyond the tiny threshold to
        # the fused device wave (_insert_wave_fused)
        raise AssertionError(
            "host _search_candidates called on a non-tiny graph"
        )

    def _layer_nodes(self, layer: int) -> np.ndarray:
        if layer == 0:
            return np.flatnonzero(self._levels >= 0)
        return np.asarray(sorted(self._upper.get(layer, {})), np.int64)

    def _set_links(self, r: int, layer: int, targets: np.ndarray) -> None:
        if layer == 0:
            lst = np.full((self.m0,), -1, np.int32)
            lst[: len(targets)] = targets
            self._nb0[r] = lst
            self._dirty_nb0.add(int(r))
        else:
            self._upper.setdefault(layer, {})[r] = [int(t) for t in targets]
            self._dirty_upper.setdefault(layer, set()).add(int(r))

    # ----------------------------------------------------------------- search

    def _invalidate_device(self) -> None:
        if self._host_stale:
            # device link tables are authoritative after fused inserts;
            # pull them down before dropping the device copy
            self._sync_host()
        self._device_state = None
        self._dirty_vec.clear()
        self._dirty_nb0.clear()
        self._dirty_upper.clear()

    def _clear_dirty(self) -> None:
        self._dirty_vec.clear()
        self._dirty_nb0.clear()
        self._dirty_upper.clear()

    def _upper_rows(self, layer: int, rows: np.ndarray) -> np.ndarray:
        nodes = self._upper.get(layer, {})
        tbl = np.full((len(rows), self.m), -1, np.int32)
        for i, r in enumerate(rows):
            lst = nodes.get(int(r))
            if lst:
                tbl[i, : min(len(lst), self.m)] = lst[: self.m]
        return tbl

    @staticmethod
    def _pad_rows(rows: np.ndarray) -> np.ndarray:
        """Pad a dirty-row list to a pow2 bucket by repeating the first
        row: identical shapes across waves keep the eager scatter ops'
        compiled executables cached (remote compiles cost ~0.7 s each on
        the tunneled chip — unbucketed shapes made EVERY wave recompile,
        the r1 insert-throughput killer).  Duplicate indices carry
        identical payloads, so the scatter stays deterministic."""
        target = next_pow2(len(rows), floor=256)
        pad = target - len(rows)
        if pad == 0:
            return rows
        return np.concatenate([rows, np.full(pad, rows[0], rows.dtype)])

    def _flush_delta(self, state) -> None:
        """Scatter dirty host rows into the resident device arrays —
        O(changed rows) upload instead of O(graph) per wave.  One fused
        jit dispatch with buffer donation (no on-device copies, no
        per-scatter tunnel round trips)."""
        if self._dirty_vec or self._dirty_nb0:
            vrows = self._pad_rows(
                np.fromiter(self._dirty_vec, np.int64)
                if self._dirty_vec
                else np.zeros(1, np.int64)
            )
            nrows = self._pad_rows(
                np.fromiter(self._dirty_nb0, np.int64)
                if self._dirty_nb0
                else np.zeros(1, np.int64)
            )
            vecs = self._prep(self._hx[vrows])
            (
                state["x"], state["x_sq"], state["valid"],
                state["levels"], state["nb0"],
            ) = _delta_apply(
                state["x"],
                state["x_sq"],
                state["valid"],
                state["levels"],
                state["nb0"],
                jnp.asarray(vrows),
                jnp.asarray(vecs),
                jnp.asarray(np.einsum("rd,rd->r", vecs, vecs)),
                jnp.asarray(self._hvalid[vrows]),
                jnp.asarray(self._levels[vrows]),
                jnp.asarray(nrows),
                jnp.asarray(self._nb0[nrows]),
            )
            state.pop("xa", None)  # walk arenas stale after a scatter
            state.pop("xp", None)
        for layer, dirty in self._dirty_upper.items():
            if not dirty:
                continue
            if layer > state["ustack"].shape[0]:
                # a host-path wave raised max_level: rebuild the stack
                self._device_state = None
                self._device_arrays()
                return
            rows = self._pad_rows(np.fromiter(dirty, np.int64))
            state["ustack"] = state["ustack"].at[
                layer - 1, jnp.asarray(rows)
            ].set(jnp.asarray(self._upper_rows(layer, rows)))
        if self._dirty_upper:
            # host-path surgery may have added/removed upper-layer
            # nodes; refresh the compacted member arenas from the host
            # level table (removals alone would self-filter, but new
            # members MUST be present for future wave pools to see them)
            members, mcount = self._build_members_host(
                int(state["ustack"].shape[0])
            )
            state["members"] = jnp.asarray(members)
            state["mcount"] = jnp.asarray(mcount)
        self._clear_dirty()

    def _device_arrays(self):
        if self._device_state is not None:
            if self._dirty_vec or self._dirty_nb0 or self._dirty_upper:
                self._flush_delta(self._device_state)
            return self._device_state
        x = self._prep(self._hx)
        # stacked [L, cap, M] upper tables: one array so the fused
        # search/insert steps loop layers statically inside a single jit
        # (upper layers are small, ~N/M^layer nodes; density keeps ids
        # global).  Every layer up to max_level gets a slab, even if
        # empty — searching an empty layer just returns the entry point.
        L = max(self._max_level, 0)
        ustack = np.full((L, self._cap, self.m), -1, np.int32)
        for layer in range(1, L + 1):
            for node, lst in self._upper.get(layer, {}).items():
                ustack[layer - 1, node, : len(lst)] = lst[: self.m]
        members, mcount = self._build_members_host(L)
        state = {
            "x": jnp.asarray(x),
            "x_sq": jnp.asarray(np.einsum("nd,nd->n", x, x)),
            "valid": jnp.asarray(self._hvalid),
            "levels": jnp.asarray(self._levels),
            "nb0": jnp.asarray(self._nb0),
            "ustack": jnp.asarray(ustack),
            "members": jnp.asarray(members),
            "mcount": jnp.asarray(mcount),
        }
        self._device_state = state
        self._clear_dirty()
        return state

    def _scan_hi_water(self) -> int:
        """Arena high-water mark (1 + max row id that has ever been
        valid): the fused wave's layer-0 pool scan covers only
        ceil(hi/chunk) chunks instead of cap/chunk (see
        wave_insert._masked_scan_topk — after a pow2 capacity growth
        half the arena is guaranteed dead, and the O(cap) scan was the
        dominant wave cost).  Never decremented: a stale-high value is
        only a missed optimization, never a correctness issue."""
        hi = getattr(self, "_hi_water", None)
        if hi is None:
            live = np.flatnonzero(self._hvalid)
            hi = self._hi_water = (
                int(live[-1]) + 1 if live.size else 0
            )
        return hi

    def _walk_arena(self, state):
        """Cached ``beam_ops.augment_arena`` table for the serving walk
        (one gather per hop instead of x/x_sq/valid — see the
        walk_dtype comment in __init__).  Self-validating: jax arrays
        are immutable, so holding the exact source array objects and
        comparing identity catches EVERY mutation path (wave commits,
        delta scatters, refine) — mutators also pop "xa" eagerly to
        free the HBM sooner."""
        src = (state["x"], state["x_sq"], state["valid"])
        prev = state.get("xa_srcs")
        if state.get("xa") is None or prev is None or any(
            a is not b for a, b in zip(prev, src)
        ):
            x = state["x"]
            if self.walk_dtype == "bfloat16":
                x = x.astype(jnp.bfloat16)
            state["xa"] = beam_ops.augment_arena(
                x, state["x_sq"], state["valid"], self.metric
            )
            state["xa_srcs"] = src
        return state["xa"]

    def _packed_arena(self, state):
        """Cached ``beam_ops.pack_neighbors`` arena (+ dequant scale)
        for the packed serving walk; the pack snapshots BOTH vectors
        and the layer-0 link table, so it revalidates against the
        identity of each (same scheme as ``_walk_arena``)."""
        src = (state["x"], state["nb0"])
        prev = state.get("xp_srcs")
        if state.get("xp") is None or prev is None or any(
            a is not b for a, b in zip(prev, src)
        ):
            xp, scale = beam_ops.pack_neighbors(*src)
            state["xp"], state["xp_scale"] = xp, scale
            state["xp_srcs"] = src
        return state["xp"], state["xp_scale"]

    def pack_walk(self) -> None:
        """Prebuild the packed walk arena (freeze-time hook): serving
        stays read-only-fast from the first query instead of paying the
        pack on it."""
        self.walk_packed = True
        self._packed_arena(self._device_arrays())

    def _member_slab_width(self) -> int:
        """Static width S of the per-upper-layer compacted member-id
        arenas: ~2x the expected layer-1 population (cap/M with the
        hnswlib level distribution, P(level>=l) = M^-l) so device-side
        appends essentially never overflow; the exact host mirror
        regrows it when a pathological level draw does."""
        return int(next_pow2(max(4096, self._cap // 8)))

    def _build_members_host(self, L: int):
        """[L, S] member-id arenas + counts from the (always-accurate)
        host level table — used at device-state build and on host-
        surgery flushes; the fused wave path appends device-side.  S
        grows past the default width if the real layer-1 population
        demands it (restored indexes with unusual level draws)."""
        S = self._member_slab_width()
        ids_by_layer = [
            np.flatnonzero(self._levels >= layer) for layer in range(1, L + 1)
        ]
        need = max((ids.size for ids in ids_by_layer), default=0)
        while S < need:
            S *= 2
        members = np.full((L, S), -1, np.int32)
        mcount = np.zeros((L,), np.int32)
        for layer in range(1, L + 1):
            ids = ids_by_layer[layer - 1]
            members[layer - 1, : ids.size] = ids
            mcount[layer - 1] = ids.size
        self._mcount_host = mcount.astype(np.int64).copy()
        return members, mcount

    def build_route(self, seed_probes: int = 8, k: int | None = None):
        """Enable centroid-routed multi-entry search: fit (or reuse the
        cluster build's) k-means routing state, compute each cluster's
        medoid row, and seed every layer-0 beam with the query's
        ``seed_probes`` nearest clusters' medoids alongside the classic
        descent entry.

        Motivation (RESULTS.md "The 4M run"): at multi-million-row
        density the single-entry greedy descent is the recall@ef100
        bottleneck — the walk starts too far from the query's region.
        One [B, K] MXU matmul routes the query to K clusters for ~free
        on this hardware (the same inversion the cluster BUILD uses);
        hnswlib has no analog because a CPU can't afford the matmul.
        Works for any construction path (exact, cluster-routed,
        restored) — no reference analog (index.cc searches descend from
        the single top-layer entry).
        """
        route = getattr(self, "_cluster_route", None)
        state = self._device_arrays()
        if route is not None and route.get("built_size"):
            if self._size >= 2 * route["built_size"]:
                route = None  # stale — the index doubled; refit
        if route is None or "cent" not in route:
            from embeddinghub_tpu.ops import kmeans as km

            if k is None:
                k = max(16, next_pow2(
                    max(1, self._size // max(self.cluster_target, 1)),
                    floor=16,
                ))
            self._sync_host()
            live = np.flatnonzero(self._hvalid)
            samp = live[:: max(1, live.size // (1 << 18))][: 1 << 18]
            cent = km.fit_kmeans(
                jnp.asarray(self._prep(self._hx[samp])), k,
                iters=8, seed=11, limit=samp.size,
            )
            assign = km.assign_clusters(state["x"], cent)
            route = self._cluster_route = {
                "cent": np.asarray(cent, np.float32),
                "assign": np.asarray(assign, np.int32),
            }
        cent = route["cent"]
        assign = route["assign"]
        cap = self._cap
        if assign.shape[0] < cap:  # rows streamed past the build's n
            assign = np.concatenate([
                assign,
                np.full((cap - assign.shape[0],), -1, np.int32),
            ])
        # per-row squared distance to its own centroid, chunked on
        # device (a [cap, K] distance matrix would be huge at 4M+)
        cent_d = jnp.asarray(cent)
        d2 = np.empty((cap,), np.float32)
        step = 1 << 18
        safe_assign = np.maximum(assign, 0)
        for s in range(0, cap, step):
            e = min(cap, s + step)
            xc = jax.lax.dynamic_slice_in_dim(state["x"], s, e - s)
            cc = cent_d[jnp.asarray(safe_assign[s:e])]
            d2[s:e] = np.asarray(((xc - cc) ** 2).sum(axis=1))
        valid = np.asarray(state["valid"])
        d2[~valid[:cap]] = np.inf
        d2[assign < 0] = np.inf
        # medoid per cluster = valid row with min distance to centroid
        medoids = np.full((cent.shape[0],), -1, np.int32)
        order = np.lexsort((d2, assign))
        ga = assign[order]
        heads = np.ones(ga.shape[0], bool)
        heads[1:] = ga[1:] != ga[:-1]
        for pos in np.flatnonzero(heads):
            c = ga[pos]
            if c >= 0 and np.isfinite(d2[order[pos]]):
                medoids[c] = order[pos]
        route["medoids"] = medoids
        route["built_size"] = self._size
        route["_dev"] = (
            jnp.asarray(self._prep(cent.astype(np.float32))),
            jnp.asarray(
                np.einsum("kd,kd->k", cent, cent).astype(np.float32)
            ),
            jnp.asarray(medoids),
        )
        self.seed_probes = int(seed_probes)
        return self

    def search(
        self, queries: np.ndarray, k: int, ef: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = as_f32_matrix(queries, self.dims)
        b = queries.shape[0]
        if self._size == 0 or k <= 0 or self._entry < 0:
            return (
                np.full((b, max(k, 0)), np.inf, np.float32),
                np.full((b, max(k, 0)), -1, np.int64),
            )
        ef = max(ef or self.ef_search, k)
        state = self._device_arrays()
        pb = _bucket(b)
        q = np.zeros((pb, self.dims), np.float32)
        q[:b] = self._prep(queries)
        ef_l = min(next_pow2(ef, floor=8), 1024)
        route = getattr(self, "_cluster_route", {}) or {}
        if self.auto_seed_probes > 0 and self._size >= self.auto_route_min:
            if route.get("_dev") is None or self._size >= 2 * route.get(
                "built_size", self._size + 1
            ):
                self.build_route(self.auto_seed_probes)
                route = self._cluster_route
        seeds = (
            min(self.seed_probes, ef_l - 1)
            if self.seed_probes > 0 and route.get("_dev") is not None
            else 0
        )
        # fused full-graph search: upper-layer descent + layer-0 beam in
        # ONE dispatch (the per-layer dispatch loop cost one tunnel round
        # trip per layer in r2)
        spec = max(1, int(getattr(self, "spec", 1)))
        exit_k = int(getattr(self, "exit_k", 0))
        fused = getattr(self, "walk_dtype", "off") != "off"
        packed = bool(fused and getattr(self, "walk_packed", False))
        # fused mode re-scores the kk rows the caller reads against the
        # exact f32 arena inside the same dispatch (bf16 ranks, f32
        # distances out); kk buckets so k=1..8 share one compile
        kk = min(ef_l, next_pow2(k, floor=8)) if fused else 0
        gs = self._gs_fns.get((ef_l, seeds, spec, exit_k, kk, packed))
        if gs is None:
            from embeddinghub_tpu.ops import wave_insert

            gs = wave_insert.make_graph_search(
                metric=self.metric,
                ef=ef_l,
                expand=self.expand,
                max_hops=2 * ef_l + 64,
                seed_probes=seeds,
                spec=spec,
                exit_k=exit_k,
                rerank_k=kk,
                packed=packed,
            )
            self._gs_fns[(ef_l, seeds, spec, exit_k, kk, packed)] = gs
        if packed:
            xp, xp_scale = self._packed_arena(state)
            seed_args = ()
            if seeds:
                seed_args = tuple(route["_dev"])
            d, ids = gs(
                jnp.asarray(q),
                jnp.int32(self._entry),
                *seed_args,
                state["nb0"],
                state["ustack"],
                self._walk_arena(state),
                xp,
                xp_scale,
                state["x"],
                state["x_sq"],
                state["valid"],
            )
            d = np.asarray(d)[:b, :k]
            ids = np.asarray(ids)[:b, :k].astype(np.int64)
            ids[~np.isfinite(d)] = -1
            return d, ids
        if fused:
            walk_x = self._walk_arena(state)
            walk_args = (walk_x, None, None, state["x"], state["x_sq"])
        else:
            walk_args = (state["x"], state["x_sq"], state["valid"])
        if seeds:
            cent_d, cent_sq_d, medoids_d = route["_dev"]
            d, ids = gs(
                jnp.asarray(q),
                jnp.int32(self._entry),
                cent_d,
                cent_sq_d,
                medoids_d,
                state["nb0"],
                state["ustack"],
                *walk_args,
            )
        else:
            d, ids = gs(
                jnp.asarray(q),
                jnp.int32(self._entry),
                state["nb0"],
                state["ustack"],
                *walk_args,
            )
        d = np.asarray(d)[:b, :k]
        ids = np.asarray(ids)[:b, :k].astype(np.int64)
        ids[~np.isfinite(d)] = -1
        if self.metric == "l2":
            pass  # beam returns true squared L2 already
        return d, ids

    # ------------------------------------------------------------------ misc

    @property
    def size(self) -> int:
        return self._size

    def vector(self, row: int) -> np.ndarray:
        return self._hx[row].copy()

    def vectors(self, rows: np.ndarray) -> np.ndarray:
        return self._hx[np.asarray(rows, dtype=np.int64)]

    # -------------------------------------------------------------- snapshot

    def state_arrays(self) -> dict[str, np.ndarray]:
        self._sync_host()  # fused inserts leave the host mirror stale
        arrs = {
            "x": self._hx,
            "valid": self._hvalid,
            "levels": self._levels,
            "nb0": self._nb0,
            "meta": np.asarray(
                [
                    self._entry,
                    self._max_level,
                    self.m,
                    self.ef_construction,
                    self.ef_search,
                ],
                np.int64,
            ),
        }
        for layer, nodes in self._upper.items():
            flat = []
            for node, lst in nodes.items():
                flat.append([node] + lst + [-1] * (self.m - len(lst)))
            if flat:
                arrs[f"upper{layer}"] = np.asarray(flat, np.int64)
        route = getattr(self, "_cluster_route", None)
        if route and "medoids" in route:
            # seeded-search routing state survives snapshot/restore
            arrs["route_cent"] = route["cent"]
            arrs["route_medoids"] = route["medoids"]
            arrs["route_seed_probes"] = np.asarray(
                [self.seed_probes], np.int64
            )
        return arrs

    @classmethod
    def from_state(
        cls, dims: int, metric: str, arrays: dict[str, np.ndarray], **kw
    ) -> "HNSWIndex":
        meta = arrays["meta"]
        if len(meta) >= 5 and "ef_search" not in kw:
            kw = dict(kw, ef_search=int(meta[4]))
        idx = cls(
            dims,
            metric=metric,
            m=int(meta[2]),
            ef_construction=int(meta[3]),
            capacity=arrays["x"].shape[0],
            **kw,
        )
        idx._hx[:] = arrays["x"]
        idx._hvalid[:] = arrays["valid"]
        idx._levels[:] = arrays["levels"]
        idx._nb0[:] = arrays["nb0"]
        idx._entry, idx._max_level = int(meta[0]), int(meta[1])
        idx._size = int(np.count_nonzero(idx._hvalid))
        for name, arr in arrays.items():
            if name.startswith("upper"):
                layer = int(name[5:])
                idx._upper[layer] = {
                    int(row[0]): [int(v) for v in row[1:] if v >= 0]
                    for row in arr
                }
        if "route_cent" in arrays:
            cent = np.asarray(arrays["route_cent"], np.float32)
            medoids = np.asarray(arrays["route_medoids"], np.int32)
            idx._cluster_route = {
                "cent": cent,
                "medoids": medoids,
                "_dev": (
                    jnp.asarray(idx._prep(cent)),
                    jnp.asarray(np.einsum("kd,kd->k", cent, cent)
                                .astype(np.float32)),
                    jnp.asarray(medoids),
                ),
            }
            idx.seed_probes = int(arrays["route_seed_probes"][0])
        return idx
