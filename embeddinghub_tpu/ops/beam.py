"""Batched graph beam search — the TPU replacement for hnswlib's
``searchKnn``/``searchBaseLayer`` (reference hot loop behind
``index.cc:41-51``).

hnswlib walks the graph one query at a time with priority queues and a
visited-bitset.  That shape (pointer chasing, dynamic heaps) is hostile
to the MXU/VPU, so this kernel restructures the walk as fixed-shape
SPMD over a query batch:

  * candidate pool   — ``[B, EF]`` (dist, id, expanded-flag) arrays; the
    "heap" is a masked top-k merge;
  * expansion        — the best ``E`` unexpanded candidates per query
    expand per hop (E=1 reproduces hnswlib's order; E>1 trades a few
    extra distance evals for ~E x fewer sequential hops — the hops are
    the latency-bound part on TPU);
  * neighbor fetch   — gather rows of the ``[N, M]`` neighbor table,
    then one ``[B, E*M, D] x [B, D]`` distance einsum (MXU);
  * visited set      — none needed: new fetches are deduped against the
    current pool (``[B, E*M, EF]`` compare).  Because the pool's worst
    distance only ever improves, an evicted node can never re-enter, so
    "in-pool dedup + expanded flags" IS exact visited semantics; a
    re-fetched evicted node merely recomputes one distance and fails
    the merge.  This removes hnswlib's visited-bitset state entirely —
    the classic trade of a little redundant compute for no sequential
    bookkeeping;
  * termination      — ``lax.while_loop`` whose condition mirrors
    hnswlib's: stop when the nearest unexpanded candidate is farther
    than the worst pool entry (pool full), all queries jointly.

Shapes are static in (B, EF, E, M); no recompilation per query batch
(B is bucketed by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


def _pairwise_to_neighbors(q, nvecs, metric, nsq):
    """dist(q [B, D], nvecs [B, K, D]) -> [B, K] (squared L2 or 1-dot)."""
    dots = jnp.einsum(
        "bkd,bd->bk", nvecs, q, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        qsq = jnp.einsum("bd,bd->b", q, q)[:, None]
        return jnp.maximum(nsq - 2.0 * dots + qsq, 0.0)
    return 1.0 - dots


def augment_arena(x, x_sq, valid, metric: str):
    """Fold ``x_sq`` and ``valid`` INTO the vector arena as trailing
    penalty columns so the walk needs ONE gather per hop.

    TPU gathers cost per-INDEX, not per-byte (measured r5: the [B, E*M]
    scalar gathers ``x_sq[nb]`` 1.9 ms + ``valid[nb]`` 2.2 ms vs 2.5 ms
    for the whole [B, E*M, 128] vector gather at B=1024) — so the
    classic three-gather fetch spends ~60% of its time fetching 5 bytes
    per row.  The augmented arena carries, after the D vector columns:

      * f32 arena  — one column: pen = x_sq (l2) or 0 (ip/cosine),
        +inf where the row is dead;
      * bf16 arena — two columns hi/lo with hi+lo == pen to f32
        round-off (bf16 alone quantizes x_sq to ~0.4%, which is above
        the distance gaps that decide the ranking).

    dist then = pen - 2 q.x + |q|^2 (l2) / 1 - q.x + pen (ip): dead
    rows score +inf with no mask gather.  The lane padding this adds
    (D=128 -> 2-column tail pads the row to 256 lanes) costs HBM bytes,
    not gather time — per-index cost dominates the fetch.
    """
    pen = x_sq if metric == "l2" else jnp.zeros_like(x_sq)
    pen = jnp.where(valid, pen.astype(jnp.float32), jnp.inf)
    if x.dtype == jnp.bfloat16:
        hi = pen.astype(jnp.bfloat16)
        lo = jnp.where(
            jnp.isfinite(pen), pen - hi.astype(jnp.float32), 0.0
        ).astype(jnp.bfloat16)
        cols = jnp.stack([hi, lo], axis=1)
    else:
        cols = pen[:, None].astype(x.dtype)
    return jnp.concatenate([x, cols], axis=1)


def _aug_cols(x_dtype) -> int:
    return 2 if x_dtype == jnp.bfloat16 else 1


def _pairwise_fused(q, g, metric, d):
    """dist(q [B, D], g [B, K, D+A]) where g rows came from an
    ``augment_arena`` table; the trailing A columns are the penalty."""
    dots = jnp.einsum(
        "bkd,bd->bk", g[..., :d], q, preferred_element_type=jnp.float32
    )
    pen = g[..., d].astype(jnp.float32)
    if g.shape[-1] > d + 1:
        pen = pen + g[..., d + 1].astype(jnp.float32)
    if metric == "l2":
        qsq = jnp.einsum("bd,bd->b", q, q)[:, None]
        return jnp.maximum(pen - 2.0 * dots + qsq, 0.0)
    return 1.0 - dots + pen


def pack_neighbors(x, neighbors, scale=None, chunk: int = 1 << 16):
    """Build the packed-neighbor serving arena: ``packed[n]`` holds the
    int8-quantized vectors of node ``n``'s layer-0 neighbors,
    CONTIGUOUSLY — [N, M*D] int8.

    Why: the classic walk gathers E*M scattered rows per hop and TPU
    gathers cost per-INDEX (~10 ns each, measured r5 — 262k-row fetch
    2.5 ms at B=1024/E=8/M=32).  With the expansion's neighbor vectors
    packed per node, a hop gathers E rows of M*D bytes instead —
    8192 indices, 0.56 ms for the same bytes (5.7x).  The price is
    m0*D bytes/node (4 KB at M=32, D=128 — the arena is M x the int8
    vector store) and quantized phase-1 ranking, so callers re-score
    the returned pool against the exact arena (``rerank`` in
    make_graph_search).  Missing neighbors (-1) pack as zeros and are
    masked by id on the walk side.

    Built CHUNKED on device: the naive ``x[neighbors]`` materializes
    [N, M, D] f32 (16 GB at 1M x 32 x 128).
    """
    n, d = x.shape
    m = neighbors.shape[1]
    if scale is None:
        scale = float(jnp.max(jnp.abs(x)))
    inv = 127.0 / scale

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(out, x, nb, start):
        g = x[jnp.maximum(nb, 0)].astype(jnp.float32)      # [C, M, D]
        g = jnp.where((nb >= 0)[:, :, None], g, 0.0)
        qv = jnp.clip(jnp.round(g * inv), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice_in_dim(
            out, qv.reshape(-1, m * d), start, axis=0
        )

    out = jnp.zeros((n, m * d), jnp.int8)
    for s in range(0, n, chunk):
        out = fill(out, x, neighbors[s : min(n, s + chunk)], s)
    return out, jnp.float32(scale / 127.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "ef", "expand", "max_hops", "with_hops", "spec", "exit_k"
    ),
)
def beam_search(
    q: jax.Array,           # [B, D] queries (f32)
    entry_ids: jax.Array,   # [B] or [B, S] entry node(s) per query (int32)
    neighbors: jax.Array,   # [N, M] int32 neighbor table, -1 padded
    x: jax.Array,           # [N, D] vectors — or [N, D+A] augment_arena
    x_sq: jax.Array | None, # [N] squared norms (l2) / ones; None = fused
    valid: jax.Array | None,  # [N] live-row mask; None = fused
    *,
    metric: str = "l2",
    ef: int = 64,
    expand: int = 4,
    max_hops: int = 256,
    with_hops: bool = False,
    spec: int = 1,
    exit_k: int = 0,
    packed: jax.Array | None = None,   # [N, M*D] int8 pack_neighbors
    dscale: jax.Array | None = None,   # scalar dequant step
) -> tuple[jax.Array, jax.Array]:
    """Beam search one layer from ``entry_ids``.

    ``entry_ids`` may be ``[B, S]`` for multi-entry seeding (S < ef):
    the pool starts with all S seeds scored, duplicates masked — the
    centroid-routed search uses this to replace the single descent
    entry with one seed per probed cluster.

    ``spec`` (speculative hop depth, default 1 = classic): each loop
    iteration expands the E best unexpanded pool candidates, then —
    for ``spec=2`` — ALSO expands the E best of the just-fetched
    neighbors before a single pool merge.  One iteration covers two
    graph hops with one merge top-k and one loop-carry, which is the
    right trade here: the measured walk is iteration-overhead-bound,
    not gather-bound (r4 on-device truth: ~11 ms/hop at B=1024 vs an
    ~82 us/hop HBM gather floor — benchmarks/graph_ondevice.py).  The
    speculative picks see only this fetch's distances (not the whole
    pool), so the expansion ORDER differs slightly from hnswlib's;
    coverage per iteration is strictly larger.

    ``exit_k`` (0 = off = hnswlib semantics): stop when the nearest
    unexpanded candidate is farther than the ``exit_k``-th best pool
    entry instead of the ``ef``-th.  With k << ef this exits the tail
    hops that only reshuffle pool entries below the returned top-k
    (hnswlib's loop keeps walking until the FULL ef pool is converged
    — index.cc:41-51; serving only reads the top k).

    Returns ``(dist [B, ef], ids [B, ef])`` sorted nearest-first
    (+inf / -1 padding); with ``with_hops`` a third scalar — the
    number of while-loop iterations the batch took (perf diagnostics:
    hops x per-hop gather bytes = the HBM traffic of the walk).
    All ids are row indices into ``x``.

    With ``x_sq=None`` (and ``valid=None``) the kernel runs in FUSED
    mode: ``x`` must be an ``augment_arena`` table whose trailing
    columns carry the x_sq/liveness penalty, and the per-hop fetch is a
    single gather (the dominant hop cost — see ``augment_arena``).

    With ``packed`` (+ ``dscale``) additionally set — PACKED mode,
    fused-only — the per-hop vector fetch reads each expanded node's
    neighbor vectors from the ``pack_neighbors`` arena: E block rows
    instead of E*M scattered rows (per-index gather cost, 5.7x — see
    ``pack_neighbors``).  Phase-1 distances are then int8-quantized;
    pair with an exact rerank of the rows the caller reads.  Deleted
    nodes are NOT masked by the packed fetch (their blocks go stale) —
    the rerank must drop them by ``valid``; intended for frozen/
    read-heavy serving.
    """
    b, d = q.shape
    fused = x_sq is None
    if packed is not None and not fused:
        raise ValueError("packed mode requires the fused (augment) arena")
    m = neighbors.shape[1]
    e = min(expand, ef)  # can't expand more candidates than the pool holds
    if metric == "l2":
        qsq_col = jnp.einsum("bd,bd->b", q, q)[:, None]

    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)

    # --- init pool with the entry point(s) ---
    entry_ids = entry_ids.astype(jnp.int32)
    if entry_ids.ndim == 1:
        entry_ids = entry_ids[:, None]
    s = entry_ids.shape[1]
    if s >= ef:
        raise ValueError(f"seed count {s} must be < ef {ef}")
    # mask duplicate seeds (same id at an earlier column) and negatives
    # so the pool never holds one node twice
    first = jnp.ones((b, s), bool)
    for j in range(1, s):
        dup_j = (entry_ids[:, :j] == entry_ids[:, j : j + 1]).any(axis=1)
        first = first.at[:, j].set(~dup_j)
    live_seed = first & (entry_ids >= 0)
    safe_seed = jnp.maximum(entry_ids, 0)
    evecs = x[safe_seed]                                   # [B, S, D(+A)]
    if fused:
        ed = _pairwise_fused(q, evecs, metric, d)
        ed = jnp.where(live_seed, ed, INF)
    else:
        ed = _pairwise_to_neighbors(q, evecs, metric, x_sq[safe_seed])
        ed = jnp.where(live_seed & valid[safe_seed], ed, INF)
    seed_ids = jnp.where(live_seed, entry_ids, -1)

    pool_d = jnp.concatenate([ed, jnp.full((b, ef - s), INF)], axis=1)
    pool_i = jnp.concatenate(
        [seed_ids, jnp.full((b, ef - s), -1, jnp.int32)], axis=1
    )
    pool_x = jnp.zeros((b, ef), bool)
    # sort-invariant: the pool stays ascending-by-distance (merge top_k
    # re-establishes it every iteration) so cond can read its exit bar
    # at a fixed column instead of re-reducing the pool
    nd0, pos0 = jax.lax.top_k(-pool_d, ef)
    pool_d = -nd0
    pool_i = jnp.take_along_axis(pool_i, pos0, axis=1)

    bar_col = (exit_k if exit_k and exit_k < ef else ef) - 1

    def cond(state):
        pool_d, pool_i, pool_x, hops = state
        unexp = jnp.where(~pool_x & (pool_i >= 0), pool_d, INF)
        best_unexp = jnp.min(unexp, axis=1)
        # pool sorted ascending with INF padding: column bar_col IS the
        # (bar_col+1)-th best distance, and is +inf while the pool holds
        # fewer entries — which keeps the query active, exactly the old
        # pool_full logic
        bar = pool_d[:, bar_col]
        active = jnp.isfinite(best_unexp) & (best_unexp <= bar)
        return jnp.any(active) & (hops < max_hops)

    def fetch(sel_ids, sel_valid, pool_i, exclude):
        """Gather+score the neighbor lists of ``sel_ids`` [B, E]:
        dedup vs the pool, vs this fetch itself (keep first), and vs
        every id array in ``exclude``; return (ids [B, E*M], dist)."""
        nb = neighbors[sel_ids].reshape(b, e * m)
        nb = jnp.where(jnp.repeat(sel_valid, m, axis=1), nb, -1)
        drop = (nb[:, :, None] == pool_i[:, None, :]).any(axis=2)
        eq = nb[:, :, None] == nb[:, None, :]
        earlier = jnp.tril(jnp.ones((e * m, e * m), bool), k=-1)
        drop |= (eq & earlier[None]).any(axis=2)
        for ex in exclude:
            drop |= (nb[:, :, None] == ex[:, None, :]).any(axis=2)
        live = (nb >= 0) & ~drop
        nb_safe = jnp.where(live, nb, 0)
        if packed is not None:
            blk = packed[sel_ids]                       # [B, E, M*D]
            xq = blk.reshape(b, e * m, d).astype(jnp.bfloat16)
            xq = xq * dscale.astype(jnp.bfloat16)
            dots = jnp.einsum(
                "bkd,bd->bk", xq, q.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if metric == "l2":
                nsq = jnp.einsum(
                    "bkd,bkd->bk", xq, xq,
                    preferred_element_type=jnp.float32,
                )
                ndist = jnp.maximum(nsq - 2.0 * dots + qsq_col, 0.0)
            else:
                ndist = 1.0 - dots
            return jnp.where(live, nb, -1), jnp.where(live, ndist, INF)
        nvecs = x[nb_safe]
        if fused:
            ndist = jnp.where(
                live, _pairwise_fused(q, nvecs, metric, d), INF
            )
        else:
            ndist = _pairwise_to_neighbors(
                q, nvecs, metric, x_sq[nb_safe]
            )
            ndist = jnp.where(live & valid[nb_safe], ndist, INF)
        return jnp.where(live, nb, -1), ndist

    def body(state):
        pool_d, pool_i, pool_x, hops = state

        # --- pick the E best unexpanded candidates per query ---
        unexp_d = jnp.where(~pool_x & (pool_i >= 0), pool_d, INF)
        _, sel = jax.lax.top_k(-unexp_d, e)             # [B, E] pool positions
        sel_valid = jnp.take_along_axis(unexp_d, sel, axis=1) < INF
        sel_ids = jnp.take_along_axis(pool_i, sel, axis=1)
        sel_ids = jnp.where(sel_valid, sel_ids, 0)

        # mark them expanded (one-hot OR over positions)
        hit = (
            jnp.arange(ef)[None, None, :] == sel[:, :, None]
        ) & sel_valid[:, :, None]
        pool_x = pool_x | hit.any(axis=1)

        nb1_id, ndist1 = fetch(sel_ids, sel_valid, pool_i, [])
        parts_d = [pool_d, ndist1]
        parts_i = [pool_i, nb1_id]
        x1 = jnp.zeros_like(ndist1, bool)

        if spec >= 2:
            # --- speculative second hop: expand the E best of the
            # just-fetched frontier before the (single) pool merge ---
            sd, ssel = jax.lax.top_k(-ndist1, e)        # [B, E] fetch cols
            s_valid = jnp.isfinite(-sd)
            s_ids = jnp.where(
                s_valid, jnp.take_along_axis(nb1_id, ssel, axis=1), 0
            )
            hit2 = (
                jnp.arange(e * m)[None, None, :] == ssel[:, :, None]
            ) & s_valid[:, :, None]
            x1 = hit2.any(axis=1)                       # entered expanded
            nb2_id, ndist2 = fetch(s_ids, s_valid, pool_i, [nb1_id])
            parts_d.append(ndist2)
            parts_i.append(nb2_id)

        # --- merge into pool (expanded flags travel with entries) ---
        all_d = jnp.concatenate(parts_d, axis=1)
        all_i = jnp.concatenate(parts_i, axis=1)
        all_x = jnp.concatenate(
            [pool_x, x1]
            + ([jnp.zeros((b, e * m), bool)] if spec >= 2 else []),
            axis=1,
        )
        nd, pos = jax.lax.top_k(-all_d, ef)
        pool_d = -nd
        pool_i = jnp.take_along_axis(all_i, pos, axis=1)
        pool_x = jnp.take_along_axis(all_x, pos, axis=1)

        return pool_d, pool_i, pool_x, hops + 1

    state = (pool_d, pool_i, pool_x, jnp.int32(0))
    pool_d, pool_i, pool_x, hops = jax.lax.while_loop(cond, body, state)
    if with_hops:
        return pool_d, pool_i, hops
    return pool_d, pool_i


@functools.partial(jax.jit, static_argnames=("metric", "max_hops"))
def greedy_descend(
    q: jax.Array,          # [B, D]
    entry_ids: jax.Array,  # [B]
    neighbors: jax.Array,  # [N, M] one upper layer's table
    x: jax.Array,          # [N, D] — or [N, D+A] augment_arena table
    x_sq: jax.Array | None,  # None = fused (see beam_search)
    *,
    metric: str = "l2",
    max_hops: int = 64,
) -> jax.Array:
    """hnswlib's upper-layer ef=1 greedy walk, batched: repeatedly move
    to the closest neighbor until no improvement.  Returns [B] ids."""
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)

    d = q.shape[1]
    fused = x_sq is None
    cur = entry_ids.astype(jnp.int32)
    if fused:
        cur_d = _pairwise_fused(q, x[cur][:, None, :], metric, d)[:, 0]
    else:
        cur_d = _pairwise_to_neighbors(
            q, x[cur][:, None, :], metric, x_sq[cur][:, None]
        )[:, 0]

    def cond(state):
        cur, cur_d, improved, hops = state
        return jnp.any(improved) & (hops < max_hops)

    def body(state):
        cur, cur_d, improved, hops = state
        nb = neighbors[cur]
        live = nb >= 0
        nb_safe = jnp.where(live, nb, 0)
        if fused:
            nd = _pairwise_fused(q, x[nb_safe], metric, d)
        else:
            nd = _pairwise_to_neighbors(
                q, x[nb_safe], metric, x_sq[nb_safe]
            )
        nd = jnp.where(live, nd, INF)
        best = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, best[:, None], axis=1)[:, 0]
        step = best_d < cur_d
        new_cur = jnp.where(
            step,
            jnp.take_along_axis(nb_safe, best[:, None], axis=1)[:, 0],
            cur,
        )
        new_d = jnp.where(step, best_d, cur_d)
        return new_cur, new_d, step, hops + 1

    cur, cur_d, _, _ = jax.lax.while_loop(
        cond, body, (cur, cur_d, jnp.ones(q.shape[0], bool), jnp.int32(0))
    )
    return cur
