"""Per-phase device profile of ONE fused insert wave at scale.

Answers ROADMAP item 4's question — where does the per-wave cost go at
a multi-million-row base?  Loads a graph saved by
``cluster_build.py --save-index``, restores it to the device, then
times each phase of ``ops/wave_insert.make_wave_commit`` separately:

  * ``scan0``    — layer-0 candidate pool: masked bf16 MXU scan over the
                   full arena (the O(cap * d) term)
  * ``member``   — upper-layer pools from the compacted member arenas
                   (O(pop), r4's replacement for L full-arena scans)
  * ``prune0``   — layer-0 forward heuristic selection (gather-bound)
  * ``recip0``   — layer-0 reciprocal commit (sort + gather + scatter;
                   timed UNDONATED, so it pays one extra nb0 copy that
                   the real fused path does not)
  * ``full``     — the real single-dispatch wave commit (donated)

Every timing forces a 1-element readback (block_until_ready does not
truly sync on the tunneled dev chip; CLAUDE.md).  The reference-side
behavior being replaced is hnswlib's sequential per-point addPoint
(reference embeddinghub/embeddingstore/index.cc:20-37) — ~1.5k rows/s
on CPU at 200k base and degrading.

Usage:
    python benchmarks/wave_profile.py --index /tmp/cb_4m_idx.npz
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(out):
    """Force completion via a tiny dependent readback."""
    import jax.numpy as jnp

    leaves = [l for l in __import__("jax").tree_util.tree_leaves(out)
              if hasattr(l, "shape")]
    for l in leaves:
        np.asarray(jnp.ravel(l)[0])


def timeit(label, fn, *args, trials=3, report=None):
    out = fn(*args)  # compile + warm
    force(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    row = {"phase": label, "ms": round(best * 1e3, 1),
           "trials_ms": [round(t * 1e3, 1) for t in ts]}
    print(json.dumps(row), flush=True)
    if report is not None:
        report[label] = best
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="npz saved by cluster_build.py --save-index")
    ap.add_argument("--wave", type=int, default=4096)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from embeddinghub_tpu.index.hnsw import HNSWIndex
    from embeddinghub_tpu.ops import nn_descent as nnd
    from embeddinghub_tpu.ops import wave_insert as wi

    z = np.load(args.index)
    dims = z["x"].shape[1]
    idx = HNSWIndex.from_state(dims, "l2", {k: z[k] for k in z.files})
    print(json.dumps({"event": "load", "n": int(idx.size),
                      "cap": int(idx._cap), "m": idx.m, "m0": idx.m0,
                      "efc": idx.ef_construction,
                      "backend": jax.default_backend()}), flush=True)

    state = idx._device_arrays()
    x, x_sq = state["x"], state["x_sq"]
    valid, levels = state["valid"], state["levels"]
    nb0, ustack = state["nb0"], state["ustack"]
    members, mcount = state["members"], state["mcount"]
    L = int(ustack.shape[0])
    w = args.wave
    ef0 = min(max(idx.ef_construction, 16), 1024)

    # wave vectors: perturbed copies of live rows (distribution-matched)
    rng = np.random.default_rng(11)
    src_rows = rng.integers(0, idx.size, w)
    vecs = idx._hx[src_rows] + 0.05 * rng.standard_normal(
        (w, dims)).astype(np.float32)
    vecs = jnp.asarray(vecs)
    vecs_sq = jnp.einsum("wd,wd->w", vecs, vecs)
    new_rows = jnp.asarray(
        np.arange(idx.size, idx.size + w, dtype=np.int32))

    report = {}
    trials = args.trials

    # ---- phase: layer-0 full-arena masked scan ----
    scan0 = jax.jit(functools.partial(
        wi._masked_scan_topk, kk=ef0, metric=idx.metric, chunk=1 << 19))
    pool0 = timeit("scan0", scan0, vecs, x, valid, x_sq,
                   trials=trials, report=report)

    # ---- phase: upper-layer member scans (all L together) ----
    if L:
        def member_all(q, x, x_sq, valid, levels, members, mcount):
            outs = []
            for layer in range(1, L + 1):
                outs.append(wi._member_scan_topk(
                    q, x, x_sq, valid, levels, layer,
                    members[layer - 1], mcount[layer - 1],
                    kk=min(ef0, idx.m * 4), metric=idx.metric))
            return outs
        timeit(f"member(x{L})", jax.jit(member_all), vecs, x, x_sq,
               valid, levels, members, mcount,
               trials=trials, report=report)

    # ---- phase: layer-0 forward selection ----
    prune0 = jax.jit(lambda x, x_sq, pool, q, q_sq: nnd.heuristic_prune(
        x, x_sq, pool,
        m_keep=idx.m, metric="ip" if idx.metric != "l2" else "l2",
        cand_k=int(pool0.shape[1]), q=q, q_sq=q_sq))
    sel = timeit("prune0", prune0, x, x_sq, pool0, vecs, vecs_sq,
                 trials=trials, report=report)
    sel = sel[:, : idx.m]

    # ---- phase: layer-0 reciprocal commit (undonated: +1 nb0 copy) ----
    src = jnp.repeat(new_rows, idx.m).reshape(w, idx.m)
    ev = sel >= 0
    recip0 = jax.jit(functools.partial(
        wi._reciprocal_commit, mmax=idx.m0, metric=idx.metric))
    timeit("recip0(undonated)", recip0, nb0, x, x_sq,
           src.reshape(-1), sel.reshape(-1), ev.reshape(-1), new_rows[0],
           trials=trials, report=report)

    # ---- phase: the real fused wave commit (donated; state re-cloned
    # per trial, clone excluded from the timing) ----
    if idx._wave_fn is None:
        idx._wave_fn = wi.make_wave_commit(
            metric=idx.metric, m=idx.m, m0=idx.m0,
            ef_construction=idx.ef_construction)
    wave_fn = idx._wave_fn
    lev_np = np.asarray([idx._assign_level() for _ in range(w)], np.int32)
    lt = jnp.asarray(np.minimum(lev_np, max(idx._max_level, 0)))
    lev = jnp.asarray(lev_np)
    wvalid = jnp.ones((w,), bool)

    def clone():
        c = [jnp.copy(a) for a in
             (x, x_sq, valid, levels, nb0, ustack, members, mcount)]
        force(c)
        return c

    hi = jnp.int32(idx._scan_hi_water())
    outs = wave_fn(*clone(), new_rows, vecs, vecs_sq, lev, lt, wvalid, hi)
    force(outs)  # compile + warm
    ts = []
    for _ in range(trials):
        st = clone()
        t0 = time.perf_counter()
        outs = wave_fn(*st, new_rows, vecs, vecs_sq, lev, lt, wvalid, hi)
        force(outs)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({"phase": "full", "ms": round(best * 1e3, 1),
                      "trials_ms": [round(t * 1e3, 1) for t in ts]}),
          flush=True)
    report["full"] = best

    acct = sum(v for k, v in report.items() if k != "full")
    print(json.dumps({
        "event": "summary", "wave": w, "n": int(idx.size),
        "accounted_ms": round(acct * 1e3, 1),
        "full_ms": round(report["full"] * 1e3, 1),
        "residual_ms": round((report["full"] - acct) * 1e3, 1),
        "implied_rows_per_s": int(w / report["full"]),
    }), flush=True)


if __name__ == "__main__":
    main()
