"""Single-dispatch HNSW insert wave — the whole commit on device.

The r1/r2 incremental insert paths paid ~25 tunnel round trips per wave
(per-layer beam dispatches, host link bookkeeping, prune dispatches,
delta scatters).  This module fuses the entire hnswlib ``addPoint``
wave — vector scatter, candidate search, forward heuristic selection,
reciprocal link commit with overflow pruning — into ONE jitted device
step with donated graph state.  Host keeps only levels/entry
bookkeeping; the device arrays are the live graph and the host mirror
goes stale until explicitly synced down (snapshot path).

**Candidate search is a masked flat MXU scan, not a graph walk.**
hnswlib beams because a CPU cannot afford exact kNN per insert; on TPU
a whole wave's candidates come from one batched scan + approx_max_k at
~1000x the beam's throughput (measured: 1.9 s of graph-walk gathers per
4096-wave — TPU row gathers run at ~25 GB/s — vs ~5-20 ms of scan), and
the pool is exact-quality, strictly better than the beam pool hnswlib
settles for.  Layers above 0 scan the (tiny) member subset via a level
mask.  The graph itself remains a faithful hnswlib structure for
serving-time walks.

Reference semantics anchored (hnswlib behind embeddingstore/index.cc:
20-37, version.cc:47-56):
  * candidate pool per layer <= node level (``link_top`` = min(level,
    pre-wave max)) with |pool| = ef_construction;
  * forward links: neighbor-selection heuristic, M kept per layer;
  * reciprocal edges appended when the target list fits, re-pruned with
    the same heuristic only on overflow (hnswlib ``prune_node``);
  * wave siblings don't see each other at search time (waves are capped
    by the caller so the quality effect stays negligible).

Everything is fixed-shape: W (wave bucket), E = W*m edges per layer,
static layer count L from the stacked upper tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from embeddinghub_tpu.ops import beam as beam_ops
from embeddinghub_tpu.ops import nn_descent as nnd

INF = jnp.float32(jnp.inf)
_DUMP = jnp.int32(1 << 30)  # sort-key sentinel for masked edges


def _reciprocal_commit(
    table: jax.Array,        # [cap, width] layer link table (post-forward)
    x: jax.Array,
    x_sq: jax.Array,
    src: jax.Array,          # [E] global source rows (wave nodes)
    dst: jax.Array,          # [E] global targets (-1 = padding)
    edge_valid: jax.Array,   # [E] bool
    dump_row: jax.Array,     # scalar int32: safe no-op scatter target
    *,
    mmax: int,
    metric: str,
) -> jax.Array:
    """Append reciprocal edges src->dst as dst->src, hnswlib overflow
    semantics, one scatter.  Masked edges re-write ``dump_row`` with its
    own current content (a no-op; the caller guarantees no real edge
    targets it)."""
    e = src.shape[0]
    r = min(mmax, 32)  # max incoming per target honored per wave

    key = jnp.where(edge_valid, dst, _DUMP)
    order = jnp.argsort(key)
    gd = key[order]
    gs = jnp.where(edge_valid[order], src[order], -1)

    iota = jnp.arange(e, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), gd[1:] != gd[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(head, iota, 0))

    # incoming sources per run, first R, via static shifts
    gs_pad = jnp.concatenate([gs, jnp.full((r,), -1, gs.dtype)])
    gd_pad = jnp.concatenate([gd, jnp.full((r,), _DUMP, gd.dtype)])
    inc = jnp.stack(
        [
            jnp.where(gd_pad[j : e + j] == gd, gs_pad[j : e + j], -1)
            for j in range(r)
        ],
        axis=1,
    )  # [E, R] (only meaningful on run heads)

    owner = head & (gd < _DUMP)
    t_safe = jnp.where(owner, gd, dump_row)
    cur = table[t_safe]                                   # [E, width]
    comb = jnp.concatenate([cur, inc], axis=1)            # [E, width+R]

    # compact valid-first (stable order preserved within each side)
    ordc = jnp.argsort((comb < 0).astype(jnp.int32), axis=1, stable=True)
    compacted = jnp.take_along_axis(comb, ordc, axis=1)
    count = jnp.sum((comb >= 0).astype(jnp.int32), axis=1)
    fits = count <= mmax

    pruned = nnd.heuristic_prune(
        x,
        x_sq,
        comb,
        m_keep=mmax,
        metric="ip" if metric != "l2" else "l2",
        cand_k=comb.shape[1],
        q=x[t_safe],
        q_sq=x_sq[t_safe],
    )
    final = jnp.where(fits[:, None], compacted[:, :mmax], pruned[:, :mmax])

    # propagate the owner's result to every edge of its run, then make
    # masked edges a no-op rewrite of dump_row
    final_all = final[run_start]
    t_all = jnp.where(gd < _DUMP, gd, dump_row)
    dump_payload = table[dump_row]
    payload = jnp.where(
        (gd < _DUMP)[:, None], final_all, dump_payload[None, :]
    )
    return table.at[t_all].set(payload)


def _masked_scan_topk(q, x, mask, x_sq, *, kk, metric, chunk, hi=None):
    """Candidate ids: top-kk of a bf16 score scan over masked rows.
    Chunked so the [W, chunk] intermediate stays bounded at deep caps.
    Order within the pool is irrelevant (heuristic_prune re-sorts by
    distance), so approx_max_k's output is used directly.

    ``hi`` (traced scalar, optional): the arena's high-water mark —
    rows at ids >= hi are all invalid.  The scan then covers only
    ceil(hi/chunk) chunks via a dynamic-trip-count loop instead of
    cap/chunk: after a capacity doubling (growth rounds to pow2) the
    O(cap) layer-0 scan was the dominant wave cost while HALF the
    arena was guaranteed dead (r5 stream_up: 2.3k inserts/s at
    cap=2M -> 1.45k/s the moment cap grew to 4M, same ~2M live rows).
    """
    cap, d = x.shape
    w = q.shape[0]
    chunk = min(chunk, cap)
    while cap % chunk:
        chunk //= 2
    n_chunks = cap // chunk
    kk = min(kk, chunk)
    qb = q.astype(jnp.bfloat16)

    def score_chunk(xc, sqc, mc):
        dots = jax.lax.dot_general(
            qb, xc.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = 2.0 * dots - sqc[None, :] if metric == "l2" else dots
        return jnp.where(mc[None, :], s, -INF)

    if n_chunks == 1:
        cv, ci = jax.lax.approx_max_k(score_chunk(x, x_sq, mask), kk)
        # unfilled slots (masked rows / sparse layers) carry arbitrary
        # indices — sparse upper layers would otherwise pool non-member
        # rows as link candidates
        return jnp.where(jnp.isfinite(cv), ci, -1)

    # The arena stays a loop-INVARIANT free variable sliced with
    # dynamic_slice inside the body.  Feeding a reshaped
    # [n_chunks, chunk, d] view through the scan instead forces XLA to
    # materialize a full-arena relayout copy whenever the same arena is
    # also gathered/scattered elsewhere in the program (measured for the
    # identical pattern in ops/topk.quantized_chunked_search: an 8 GB
    # copy(xq) HLO temp at 50M x 96) — in wave_commit that is a
    # ~2 GB/wave copy at 4M x 128 f32, pure waste.
    def merge(carry, base):
        bv, bi = carry
        xc = jax.lax.dynamic_slice_in_dim(x, base, chunk)
        sqc = jax.lax.dynamic_slice_in_dim(x_sq, base, chunk)
        mc = jax.lax.dynamic_slice_in_dim(mask, base, chunk)
        cv, ci = jax.lax.approx_max_k(score_chunk(xc, sqc, mc), kk)
        vcat = jnp.concatenate([bv, cv], axis=1)
        icat = jnp.concatenate([bi, ci + base], axis=1)
        nv, pos = jax.lax.top_k(vcat, kk)
        return nv, jnp.take_along_axis(icat, pos, axis=1)

    init = (
        jnp.full((w, kk), -INF, jnp.float32),
        jnp.full((w, kk), -1, jnp.int32),
    )
    if hi is None:
        bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        (cv, ci), _ = jax.lax.scan(
            lambda c, b: (merge(c, b), None), init, bases
        )
    else:
        n_live = jnp.clip(
            (hi.astype(jnp.int32) + chunk - 1) // chunk, 1, n_chunks
        )
        cv, ci = jax.lax.fori_loop(
            0, n_live,
            lambda i, c: merge(c, i * chunk),
            init,
        )
    return jnp.where(jnp.isfinite(cv), ci, -1)


def _member_scan_topk(q, x, x_sq, valid, levels, layer, members, count,
                      *, kk, metric, chunk=1 << 15):
    """Upper-layer candidate pool from a COMPACTED member-id arena
    (``members``: [S] row ids with ``count`` filled, -1 padded): gather
    the ~cap/M^layer member rows and score a [W, S] matmul.  Replaces a
    full-arena masked scan whose cost scaled with CAPACITY rather than
    with layer population — at 4M rows the L upper scans were ~3/4 of
    the per-wave cap-dependent cost for <7% of the scanned rows
    (ROADMAP r4: "1 full + L small scans per wave").

    Staleness is self-filtering: entries whose row died (valid=false)
    or whose level dropped below ``layer`` are masked out against the
    LIVE arena state at scan time, so removals/updates need no member
    compaction.  Duplicate entries (a re-added member) merely waste
    pool slots.

    Chunked with a ``count``-bounded dynamic trip count: the slab
    width S is sized for the LARGEST layer (~2x layer-1's population,
    itself ~cap/8), but every deeper layer shares it — at 2M rows the
    five upper scans each paid the full S=262k gather+matmul for
    populations of 125k/8k/500/30/2, making "member(x5)" 2.4x the
    whole layer-0 arena scan (249 ms vs 106 ms, r5 wave_profile).
    Scanning ceil(count/chunk) chunks makes each layer cost its own
    population."""
    S = members.shape[0]
    w = q.shape[0]
    qb = q.astype(jnp.bfloat16)

    def score(mem_c, base):
        safe = jnp.maximum(mem_c, 0)
        alive = (mem_c >= 0) & (
            base + jnp.arange(mem_c.shape[0], dtype=jnp.int32) < count
        )
        alive &= valid[safe] & (levels[safe] >= layer)
        mx = x[safe].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            qb, mx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = 2.0 * dots - x_sq[safe][None, :] if metric == "l2" else dots
        return jnp.where(alive[None, :], s, -INF)

    if S <= chunk:
        kk = min(kk, S)
        cv, ci = jax.lax.approx_max_k(score(members, 0), kk)
        ids = members[ci]
        return jnp.where(jnp.isfinite(cv), ids, -1)

    while S % chunk:
        chunk //= 2
    kk = min(kk, chunk)
    n_chunks = S // chunk

    def merge(carry, base):
        bv, bi = carry
        mem_c = jax.lax.dynamic_slice_in_dim(members, base, chunk)
        cv, ci = jax.lax.approx_max_k(score(mem_c, base), kk)
        vcat = jnp.concatenate([bv, cv], axis=1)
        icat = jnp.concatenate([bi, mem_c[ci]], axis=1)
        nv, pos = jax.lax.top_k(vcat, kk)
        return nv, jnp.take_along_axis(icat, pos, axis=1)

    init = (
        jnp.full((w, kk), -INF, jnp.float32),
        jnp.full((w, kk), -1, jnp.int32),
    )
    n_live = jnp.clip(
        (count.astype(jnp.int32) + chunk - 1) // chunk, 1, n_chunks
    )
    cv, ci_ids = jax.lax.fori_loop(
        0, n_live, lambda i, c: merge(c, i * chunk), init
    )
    return jnp.where(jnp.isfinite(cv), ci_ids, -1)


def make_wave_commit(
    *,
    metric: str,
    m: int,
    m0: int,
    ef_construction: int,
    scan_chunk: int = 1 << 19,
):
    """Build the jitted single-dispatch wave commit for a given config.

    Returned fn signature:
        (x, x_sq, valid, levels, nb0, upper, members, mcount,
         rows, vecs, vecs_sq, wave_levels, link_top, wave_valid,
         scan_hi) ->
        (x, x_sq, valid, levels, nb0, upper, members, mcount)
    ``scan_hi`` (traced int32) is the arena high-water mark bounding
    the layer-0 pool scan (see _masked_scan_topk).
    with ``upper`` a stacked [L, cap, m] table (L may be 0),
    ``levels`` the [cap] per-row level arena (-1 = dead),
    ``members``/``mcount`` the per-upper-layer compacted member-id
    arenas ([L, S] int32 / [L] int32 — see ``_member_scan_topk``; the
    commit itself appends this wave's upper-layer rows, so the arenas
    never cross the wire after the initial build),
    ``wave_levels`` each row's true assigned level, and
    ``link_top[w] = min(level_w, pre-wave max_level)``.  Padding rows
    must duplicate row 0's values in every per-row input so duplicate
    scatters stay deterministic.  The caller must guarantee
    ``mcount + wave appends <= S`` (hnsw._insert_wave_fused regrows S
    from its exact host mirror before dispatch); overflowing appends
    are dropped silently by the ``mode="drop"`` scatter.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
    def wave_commit(
        x, x_sq, valid, levels, nb0, upper, members, mcount,
        rows, vecs, vecs_sq, wave_levels, link_top, wave_valid,
        scan_hi,
    ):
        w = rows.shape[0]
        L = upper.shape[0]
        ef0 = min(max(ef_construction, 16), 1024)

        # ---- 1. per-layer candidate pools against the PRE-WAVE arena
        # (wave rows are not yet valid, so siblings are excluded exactly
        # like hnswlib's sequential addPoint).  Layer 0 is a full flat
        # scan; layers >=1 scan their compacted member arenas ----
        pools = {0: _masked_scan_topk(
            vecs, x, valid, x_sq, kk=ef0, metric=metric,
            chunk=scan_chunk, hi=scan_hi,
        )}
        for layer in range(1, L + 1):
            pools[layer] = _member_scan_topk(
                vecs, x, x_sq, valid, levels, layer,
                members[layer - 1], mcount[layer - 1],
                kk=min(ef0, m * 4), metric=metric,
            )

        # ---- 1b. append the wave's upper-layer rows to the member
        # arenas (AFTER the pools: a wave never pools its own siblings).
        # Position = count + prefix-sum; non-members route out of range
        # and are dropped ----
        S = members.shape[1] if L else 0
        for layer in range(1, L + 1):
            mk = wave_valid & (wave_levels >= layer)
            pos = mcount[layer - 1] + jnp.cumsum(mk.astype(jnp.int32)) - 1
            pos = jnp.where(mk, pos, S)
            members = members.at[layer - 1, pos].set(
                rows.astype(jnp.int32), mode="drop"
            )
            mcount = mcount.at[layer - 1].add(mk.sum(dtype=jnp.int32))

        # ---- 2. scatter wave vectors (padding rows repeat row 0 with
        # identical payloads, so duplicate scatters stay deterministic)
        x = x.at[rows].set(vecs)
        x_sq = x_sq.at[rows].set(vecs_sq)
        valid = valid.at[rows].set(True)
        levels = levels.at[rows].set(wave_levels)

        # the wave must never link to itself (pools came from the
        # pre-scatter mask, so this is belt-and-braces for update rows
        # that were already valid in the arena), and NOTHING may link to
        # the dump row (rows[0]): masked reciprocal edges rewrite it
        # with its own pre-commit content in the same scatter that real
        # edges would use, and duplicate-index scatter order is
        # unspecified — a real in-edge for rows[0] could be dropped
        dump = rows[0]
        for layer in pools:
            p = pools[layer]
            bad = (p == rows[:, None].astype(p.dtype)) | (
                p == dump.astype(p.dtype)
            )
            pools[layer] = jnp.where(bad, -1, p)

        # ---- 3. forward selection + commit, per layer ----
        sels = {}
        for layer in range(0, L + 1):
            pool = pools[layer]
            cw = pool.shape[1]
            # NOTE: selecting at full m0 width here (matching the exact
            # build's wide forward lists) was measured WORSE at 256k
            # SIFT-like (0.9312 vs 0.9372 @ef100): streamed rows must
            # keep free layer-0 slots so future inserts' reciprocal
            # edges land without triggering overflow pruning — exactly
            # hnswlib's M-forward / M0-capacity split.
            sel = nnd.heuristic_prune(
                x, x_sq, pool,
                m_keep=m,
                metric="ip" if metric != "l2" else "l2",
                cand_k=cw,
                q=vecs, q_sq=vecs_sq,
            )[:, :m]
            member = (link_top >= layer) & wave_valid
            sel = jnp.where(member[:, None], sel, -1)
            sels[layer] = sel
            if layer == 0:
                pad = jnp.full((w, m0 - m), -1, jnp.int32)
                payload = jnp.concatenate([sel, pad], axis=1)
                # Padding rows duplicate rows[0]; duplicate-index
                # scatters are only deterministic when every copy
                # carries the IDENTICAL payload, so padding slots write
                # row 0's NEW payload (writing its stale cur_rows here
                # let the stale copy win and near-orphaned one node per
                # ragged wave)
                payload = jnp.where(
                    wave_valid[:, None], payload, payload[0][None, :]
                )
                nb0 = nb0.at[rows].set(payload)
            else:
                cur_rows = upper[layer - 1][rows]
                payload = jnp.where(member[:, None], sel, cur_rows)
                # padding slots mirror row 0's payload (same rule)
                payload = jnp.where(
                    wave_valid[:, None], payload, payload[0][None, :]
                )
                upper = upper.at[layer - 1, rows].set(payload)

        # ---- 4. reciprocal commits, per layer ----
        for layer in range(0, L + 1):
            sel = sels[layer]
            km = sel.shape[1]
            src = jnp.repeat(rows.astype(jnp.int32), km).reshape(w, km)
            member = (link_top >= layer) & wave_valid
            ev = (sel >= 0) & member[:, None]
            if layer == 0:
                nb0 = _reciprocal_commit(
                    nb0, x, x_sq,
                    src.reshape(-1), sel.reshape(-1), ev.reshape(-1),
                    dump, mmax=m0, metric=metric,
                )
            else:
                upd = _reciprocal_commit(
                    upper[layer - 1], x, x_sq,
                    src.reshape(-1), sel.reshape(-1), ev.reshape(-1),
                    dump, mmax=m, metric=metric,
                )
                upper = upper.at[layer - 1].set(upd)

        return x, x_sq, valid, levels, nb0, upper, members, mcount

    return wave_commit


def make_graph_search(*, metric: str, ef: int, expand: int, max_hops: int,
                      seed_probes: int = 0, spec: int = 1, exit_k: int = 0,
                      rerank_k: int = 0, packed: bool = False):
    """Fused full-graph query: greedy descent through the stacked upper
    layers + layer-0 beam, one dispatch (the r2 search paid one dispatch
    per layer).

    With ``seed_probes > 0`` the returned fn additionally takes cluster
    routing state ``(cent [K, D], cent_sq [K], medoids [K])`` and seeds
    the layer-0 beam with the medoid row of each of the query's
    ``seed_probes`` nearest clusters ALONGSIDE the classic descent
    entry — one [B, K] MXU matmul replaces most of the serial descent's
    job of finding a good start region, which is exactly where the
    single-entry walk underperforms on dense multi-million-row arenas
    (greedy descent stalling in cluster-local minima was the measured
    1M failure mode; at 4M the residual @ef100 gap concentrates there
    too — RESULTS.md "The 4M run").

    With ``rerank_k > 0`` the fns take two extra trailing args
    ``(x_exact [N, D] f32, x_exact_sq [N])`` and re-score the top
    ``rerank_k`` pool entries against them, returning ``[B, rerank_k]``
    instead of ``[B, ef]`` — the serving pairing for a FUSED (bf16
    ``beam_ops.augment_arena``) walk arena: the walk ranks in bf16 at
    one-gather-per-hop speed, the k rows the caller actually reads get
    exact f32 distances, all still one dispatch."""

    def _rerank(q, d, ids, x_exact, x_exact_sq, valid=None):
        kk = min(rerank_k, d.shape[1])
        top = ids[:, :kk]
        safe = jnp.maximum(top, 0)
        dots = jnp.einsum(
            "bkd,bd->bk", x_exact[safe], q,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "l2":
            qsq = jnp.einsum("bd,bd->b", q, q)[:, None]
            nd = jnp.maximum(x_exact_sq[safe] - 2.0 * dots + qsq, 0.0)
        else:
            nd = 1.0 - dots
        nd = jnp.where((top >= 0) & jnp.isfinite(d[:, :kk]), nd, jnp.inf)
        if valid is not None:
            # packed fetches don't see deletions (stale blocks); the
            # exact pass drops them here
            nd = jnp.where(valid[safe], nd, jnp.inf)
        ns, pos = jax.lax.top_k(-nd, kk)
        return -ns, jnp.take_along_axis(top, pos, axis=1)

    if packed:
        if rerank_k <= 0:
            raise ValueError("packed walk requires rerank_k > 0 "
                             "(phase-1 distances are int8-quantized)")
        s = seed_probes

        @jax.jit
        def graph_search_packed(q, entry, *args):
            # args: [cent, cent_sq, medoids,] nb0, upper, xa,
            #       packed_arr, dscale, x_exact, x_exact_sq, valid_arr
            if s > 0:
                cent, cent_sq, medoids = args[:3]
                args = args[3:]
            (nb0, upper, xa, packed_arr, dscale,
             x_exact, x_exact_sq, valid_arr) = args
            b = q.shape[0]
            L = upper.shape[0]
            cur = jnp.full((b,), entry, jnp.int32)
            for layer in range(L, 0, -1):
                cur = beam_ops.greedy_descend(
                    q, cur, upper[layer - 1], xa, None, metric=metric,
                )
            entries = cur
            if s > 0:
                dots = jax.lax.dot_general(
                    q, cent, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                score = (2.0 * dots - cent_sq[None, :]
                         if metric == "l2" else dots)
                _, cid = jax.lax.top_k(score, min(s, cent.shape[0]))
                entries = jnp.concatenate(
                    [cur[:, None], medoids[cid]], axis=1
                )
            d, ids = beam_ops.beam_search(
                q, entries, nb0, xa, None, None,
                metric=metric, ef=ef, expand=min(expand, ef),
                max_hops=max_hops, spec=spec, exit_k=exit_k,
                packed=packed_arr, dscale=dscale,
            )
            return _rerank(q, d, ids, x_exact, x_exact_sq, valid_arr)

        return graph_search_packed

    if seed_probes <= 0:

        @jax.jit
        def graph_search(q, entry, nb0, upper, x, x_sq, valid,
                         *exact):
            b = q.shape[0]
            L = upper.shape[0]
            cur = jnp.full((b,), entry, jnp.int32)
            for layer in range(L, 0, -1):
                cur = beam_ops.greedy_descend(
                    q, cur, upper[layer - 1], x, x_sq, metric=metric,
                )
            d, ids = beam_ops.beam_search(
                q, cur, nb0, x, x_sq, valid,
                metric=metric, ef=ef, expand=min(expand, ef),
                max_hops=max_hops, spec=spec, exit_k=exit_k,
            )
            if rerank_k:
                return _rerank(q, d, ids, *exact)
            return d, ids

        return graph_search

    s = seed_probes

    @jax.jit
    def graph_search_routed(q, entry, cent, cent_sq, medoids,
                            nb0, upper, x, x_sq, valid, *exact):
        b = q.shape[0]
        L = upper.shape[0]
        cur = jnp.full((b,), entry, jnp.int32)
        for layer in range(L, 0, -1):
            cur = beam_ops.greedy_descend(
                q, cur, upper[layer - 1], x, x_sq, metric=metric,
            )
        dots = jax.lax.dot_general(
            q, cent, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        score = 2.0 * dots - cent_sq[None, :] if metric == "l2" else dots
        _, cid = jax.lax.top_k(score, min(s, cent.shape[0]))
        entries = jnp.concatenate([cur[:, None], medoids[cid]], axis=1)
        d, ids = beam_ops.beam_search(
            q, entries, nb0, x, x_sq, valid,
            metric=metric, ef=ef, expand=min(expand, ef),
            max_hops=max_hops, spec=spec, exit_k=exit_k,
        )
        if rerank_k:
            return _rerank(q, d, ids, *exact)
        return d, ids

    return graph_search_routed
