"""NN-descent — batched k-NN-graph construction on the MXU.

hnswlib builds its graph by *sequential insertion* (one point at a
time, each doing an ef-bounded graph search).  That order-dependence is
the antithesis of TPU execution, so bulk construction here uses
NN-descent (Dong et al., WWW'11): start from a random neighbor table
and iteratively refine every node's neighbors from its
neighbors-of-neighbors — each iteration is nothing but gathers, one big
distance einsum, and a top-k, all batched over every node at once.

A handful of iterations converges to a high-recall kNN graph; the HNSW
layer then applies the standard neighbor-selection heuristic (batched,
on device) to turn the kNN rows into the pruned, diversity-preserving
adjacency hnswlib's search semantics expect.

Candidate set per node and iteration:
    own neighbors  [M]  ∪  reverse-sample [M]  ∪  neighbors² [M*M]
Dedup is sort-based (sort candidate ids, mask repeats) — no dynamic
shapes anywhere; blocks of nodes stream through a lax.map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


def _block_refine(x, x_sq, nb, rev, block_ids, metric):
    """One refinement step for a block of nodes.

    block_ids [B]; nb [N, M]; rev [N, M] -> new neighbors [B, M]."""
    m = nb.shape[1]
    b = block_ids.shape[0]
    own = nb[block_ids]                      # [B, M]
    rsm = rev[block_ids]                     # [B, M]
    hop2 = nb[jnp.where(own >= 0, own, 0)].reshape(b, m * m)
    hop2 = jnp.where(
        jnp.repeat(own >= 0, m, axis=1), hop2, -1
    )
    cand = jnp.concatenate([own, rsm, hop2], axis=1)   # [B, C]
    c = cand.shape[1]

    # sort-based dedup (repeated ids -> -1)
    order = jnp.argsort(cand, axis=1)
    sorted_ids = jnp.take_along_axis(cand, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), sorted_ids[:, 1:] == sorted_ids[:, :-1]],
        axis=1,
    )
    sorted_ids = jnp.where(dup, -1, sorted_ids)
    # drop self
    sorted_ids = jnp.where(sorted_ids == block_ids[:, None], -1, sorted_ids)

    safe = jnp.where(sorted_ids >= 0, sorted_ids, 0)
    cvecs = x[safe]                                    # [B, C, D]
    q = x[block_ids]                                   # [B, D]
    dots = jnp.einsum("bcd,bd->bc", cvecs, q, preferred_element_type=jnp.float32)
    if metric == "l2":
        d = x_sq[safe] - 2.0 * dots + x_sq[block_ids][:, None]
    else:
        d = 1.0 - dots
    d = jnp.where(sorted_ids >= 0, d, INF)

    nd, pos = jax.lax.top_k(-d, m)
    new_nb = jnp.take_along_axis(sorted_ids, pos, axis=1)
    new_nb = jnp.where(jnp.isfinite(-nd), new_nb, -1)
    return new_nb


@functools.partial(
    jax.jit, static_argnames=("m", "iters", "block", "metric")
)
def nn_descent(
    x: jax.Array,       # [N, D] f32, metric-preprocessed
    x_sq: jax.Array,    # [N]
    *,
    m: int = 32,
    iters: int = 8,
    block: int = 4096,
    metric: str = "l2",
    seed: int = 0,
) -> jax.Array:
    """Approximate kNN graph ``[N, m]`` (int32, self-excluded, -1 pad).
    N must be a multiple of ``block`` (callers pad and mask)."""
    n = x.shape[0]
    if n % block:
        raise ValueError(f"N={n} not a multiple of block={block}")
    key = jax.random.PRNGKey(seed)
    nb = jax.random.randint(key, (n, m), 0, n, dtype=jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    # avoid self-init
    nb = jnp.where(nb == ids[:, None], (nb + 1) % n, nb)

    blocks = ids.reshape(n // block, block)

    def one_iter(nb, _):
        # reverse sample: column j of rev holds some i with nb[i, j] = node
        rev = jnp.full((n, nb.shape[1]), -1, jnp.int32)
        for j in range(nb.shape[1]):
            rev = rev.at[nb[:, j], j].set(ids)

        new_nb = jax.lax.map(
            lambda bids: _block_refine(x, x_sq, nb, rev, bids, metric),
            blocks,
        ).reshape(n, nb.shape[1])
        return new_nb, None

    nb, _ = jax.lax.scan(one_iter, nb, None, length=iters)
    return nb


@functools.partial(jax.jit, static_argnames=("m_keep", "metric", "cand_k"))
def heuristic_prune(
    x: jax.Array,        # [N, D] the full (metric-preprocessed) arena
    x_sq: jax.Array,
    nb: jax.Array,       # [B, C] candidate ids (global rows), -1 padded
    *,
    m_keep: int,
    metric: str = "l2",
    cand_k: int = 64,
    q: jax.Array | None = None,     # [B, D] query points; default x rows
    q_sq: jax.Array | None = None,  # [B]
) -> jax.Array:
    """Batched hnswlib neighbor-selection heuristic: scanning candidates
    nearest-first, keep c iff d(c, node) < d(c, s) for every kept s.
    Operates on the first ``cand_k`` candidates of each row.  With
    ``q=None`` rows of ``nb`` align with rows of ``x`` (bulk build);
    explicit ``q`` serves wave inserts and reciprocal re-prunes."""
    if q is None:
        q = x
        q_sq = x_sq
    n = q.shape[0]
    # Process rows in blocks: the [B, K, K] candidate-pair matrix is the
    # memory hot spot (K=128 at 1M rows would be 65 GB unblocked).
    block = 4096
    while n % block:
        block //= 2

    def prune_block(args):
        qb, qsqb, nbb = args
        b = qb.shape[0]
        cand = nbb[:, :cand_k]
        safe = jnp.where(cand >= 0, cand, 0)
        cvecs = x[safe]                                # [B, K, D]
        dots = jnp.einsum(
            "nkd,nd->nk", cvecs, qb, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            d_q = x_sq[safe] - 2.0 * dots + qsqb[:, None]
        else:
            d_q = 1.0 - dots
        d_q = jnp.where(cand >= 0, d_q, INF)

        pr = jnp.einsum(
            "nkd,njd->nkj", cvecs, cvecs, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            pair = x_sq[safe][:, :, None] - 2.0 * pr + x_sq[safe][:, None, :]
        else:
            pair = 1.0 - pr

        # Slot-loop formulation of hnswlib's greedy heuristic: instead of
        # scanning all K candidates (K fori_loop steps), fill the m_keep
        # slots one at a time — each step accepts the nearest candidate
        # not (strictly) dominated by an already-kept one, then marks
        # everything the new element dominates.  The accepted set is
        # IDENTICAL to the candidate-scan greedy (a candidate dominated
        # by a kept element stays dominated forever; an undominated one
        # is accepted exactly when every nearer candidate is either kept
        # or dominated — which is when it becomes the masked argmin).
        # K=256, m_keep=32 -> 8x fewer sequential loop steps; the loop
        # is the device-time hot spot of the bulk build's selection.
        kept = jnp.zeros((b, cand_k), bool)
        dominated = jnp.zeros((b, cand_k), bool)

        def body(_, state):
            kept, dominated = state
            avail = ~kept & ~dominated & jnp.isfinite(d_q)
            dm = jnp.where(avail, d_q, INF)
            ci = jnp.argmin(dm, axis=1)                 # [B]
            ok = jnp.isfinite(jnp.min(dm, axis=1))
            onehot = (
                jnp.arange(cand_k)[None, :] == ci[:, None]
            ) & ok[:, None]
            pair_ci = jnp.take_along_axis(
                pair, ci[:, None, None], axis=1
            )[:, 0, :]                                  # [B, K]
            newly_dom = (pair_ci < d_q) & ok[:, None]
            return kept | onehot, dominated | newly_dom

        kept, _ = jax.lax.fori_loop(
            0, m_keep, body, (kept, dominated)
        )
        keep_d = jnp.where(kept, d_q, INF)
        nd, pos = jax.lax.top_k(-keep_d, m_keep)
        out = jnp.take_along_axis(cand, pos, axis=1)
        return jnp.where(jnp.isfinite(-nd), out, -1).astype(jnp.int32)

    nblk = n // block
    out = jax.lax.map(
        prune_block,
        (
            q.reshape(nblk, block, -1),
            q_sq.reshape(nblk, block),
            nb.reshape(nblk, block, -1),
        ),
    )
    return out.reshape(n, m_keep)


@functools.partial(jax.jit, static_argnames=("cap_in",))
def gather_reciprocal(fwd: jax.Array, valid_n: jax.Array, *, cap_in: int):
    """Device-side reciprocal-edge gather for the bulk build.

    ``fwd [P, W]`` are forward link lists (-1 padded); returns
    ``(comb [P, W+cap_in], fits [P])`` where ``comb`` is each row's
    forward ∪ incoming edge set (deduped, valid-first) and ``fits``
    marks rows within ``W`` live edges — hnswlib only prunes a neighbor
    list when it overflows, so callers heuristic-prune just the
    overflowing rows (``index/hnsw.py:_symmetrize_device``).

    The host-numpy version of this (repeat/argsort/bincount over E=P*W
    edges + row-wise sorts) cost ~30 s at 256k rows on the single-core
    host VM; on device it is one E-element sort + one scatter + two
    [P, W+cap_in] row sorts (~100 ms)."""
    P, W = fwd.shape
    E = P * W
    dump = jnp.int32(1 << 30)
    src = jnp.repeat(jnp.arange(P, dtype=jnp.int32), W)
    dst = fwd.reshape(-1)
    ev = (dst >= 0) & jnp.repeat(valid_n, W)
    key = jnp.where(ev, dst, dump)
    order = jnp.argsort(key)
    gd = key[order]
    gs = jnp.where(ev[order], src[order], -1)
    iota = jnp.arange(E, dtype=jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), gd[1:] != gd[:-1]])
    run_start = jax.lax.cummax(jnp.where(head, iota, 0))
    pos = iota - run_start
    ok = (pos < cap_in) & (gd < dump)
    # scatter incoming edges; masked ones land in a garbage row P
    rev = jnp.full((P + 1, cap_in), -1, jnp.int32)
    rev = rev.at[
        jnp.where(ok, gd, P), jnp.where(ok, pos, 0)
    ].set(jnp.where(ok, gs, -1), mode="drop")
    comb = jnp.concatenate([fwd, rev[:P]], axis=1)
    # dedup (neighbor lists are sets): sort desc, mask repeats, recompact
    comb = -jnp.sort(-comb, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((P, 1), bool), comb[:, 1:] == comb[:, :-1]], axis=1
    ) & (comb >= 0)
    comb = jnp.where(dup, -1, comb)
    comb = -jnp.sort(-comb, axis=1)
    count = jnp.sum(comb >= 0, axis=1)
    return comb, count <= W
