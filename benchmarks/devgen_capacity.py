"""Deep-scale capacity truth with a DEVICE-GENERATED arena (BASELINE
config 5's single-chip leg at 50M/100M).

The dev harness caps any TPU-attached process at ~10 minutes, and the
chip sits behind a ~30 MB/s tunnel — so the classic capacity.py flow
(host-generate 10 GB, quantize, upload) cannot reach its query stage in
one process life.  This benchmark splits the work by what actually
needs the chip:

* ``--prep`` (CPU, run it in the background): computes the query set
  and the exact f32 host oracle over the SAME deterministic synthetic
  arena, streaming block by block, and saves them to an npz.  The
  arena never materializes on the host either — only one block at a
  time.
* ``--run`` (TPU, one short foreground process): regenerates the arena
  directly ON DEVICE (JAX threefry is counter-based and
  backend-deterministic, so the device writes the same rows the oracle
  scored, up to f32 ulp noise far below the cluster noise floor),
  quantizing block-by-block into staged arena planes
  (`index/flat._deep_alloc` layout discipline — no transfer-layout
  relayout copy, the r4_cap100m.log compile-OOM).  Uploads ~0.4 MB of
  centers instead of ~10 GB of rows; the chip is claimed for minutes,
  not hours.  Then: batched query QPS, recall@10 vs the prep oracle,
  at the requested phase-1 pool ``--boost`` (the audit's HBM-free
  lever, `FlatIndex.audit_and_escalate` rung 1).

Each distinct ``--boost``/storage config is one fresh process (its
chunked-search program is a new XLA compile, 30-300 s on this remote
backend); the driver loop IS the audit escalation, run one rung per
process.  Ingest/upload wire numbers for the classic host-resident
path are r4's measured capacity.py stages (benchmarks/RESULTS.md) —
this benchmark answers the QUERY capacity question those runs could
not reach.

Matches: the RocksDB-replacement capacity story of the reference
(embeddinghub/embeddingstore/storage.cc:28-36, growth index.cc:29-31).

Usage:
  # background, CPU:
  python benchmarks/devgen_capacity.py --prep --n 50000000 \
      --out /tmp/devgen50m.npz
  # one foreground TPU process per audit rung:
  python benchmarks/devgen_capacity.py --run --n 50000000 \
      --oracle /tmp/devgen50m.npz --storage int8x2 --boost 1
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import functools
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOCK = 1 << 20
NQ = 256


def rep(**kv):
    print(json.dumps(kv), flush=True)


# ----------------------------------------------------------------- data

def make_gen(dims: int, centers_n: int, noise: float, seed: int):
    """Deterministic block generator: integer noise bits (bit-exact on
    every backend) around gaussian centers; f32 arithmetic end to end.
    std(noise_bits/127) = 0.5774, so the scale keeps capacity.py's
    NOISE semantics (~same intra-cluster spread)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kc, ka, kn, kq = jax.random.split(key, 4)
    centers = 3.0 * jax.random.normal(kc, (centers_n, dims), jnp.float32)
    nscale = jnp.float32(noise / 0.5774)

    def block_rows(centers, i, n_rows):
        a = jax.random.randint(
            jax.random.fold_in(ka, i), (n_rows,), 0, centers_n
        )
        bits = jax.random.randint(
            jax.random.fold_in(kn, i), (n_rows, dims), -127, 128
        ).astype(jnp.float32)
        rows = centers[a] + nscale * bits / 127.0
        nrm = jnp.sqrt(jnp.einsum("nd,nd->n", rows, rows))
        return rows / jnp.maximum(nrm, 1e-30)[:, None]  # cosine rows

    def queries(centers):
        return block_rows(centers, 0x51EE7, NQ)

    return centers, block_rows, queries


def make_planted_gen(dims: int, seed: int, k: int, eps: float):
    """Planted-neighbor arena: NQ random unit queries, each with ``k``
    planted rows (query + eps*noise, re-normalized) at ids
    [i*k, (i+1)*k); every other row is an independent random unit
    vector.  The oracle is known BY CONSTRUCTION (no scan): at eps=0.2
    a planted row's cosine ~0.98 vs ~0.56 for the best of 100M random
    rows, so the true top-k IS the planted set.

    This separates the two capacity questions the clustered generator
    conflates: "can the quantized arena FIND genuinely-near neighbors
    at depth" (this — retrieval-realistic: a query has a handful of
    relevant rows) vs "can it RESOLVE ties among thousands of
    near-duplicates" (the noise-0.35 cluster sets — int8-resolution
    bound, measured r5)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kb, kn, kq = jax.random.split(key, 3)

    def _unit(rows):
        nrm = jnp.sqrt(jnp.einsum("nd,nd->n", rows, rows))
        return rows / jnp.maximum(nrm, 1e-30)[:, None]

    def queries():
        return _unit(jax.random.randint(
            kq, (NQ, dims), -127, 128).astype(jnp.float32))

    def block_rows(q, i, n_rows):
        base = jax.random.randint(
            jax.random.fold_in(kb, i), (n_rows, dims), -127, 128
        ).astype(jnp.float32)
        ids = i * n_rows + jnp.arange(n_rows)
        qidx = jnp.clip(ids // k, 0, NQ - 1)
        pn = jax.random.randint(
            jax.random.fold_in(kn, i), (n_rows, dims), -127, 128
        ).astype(jnp.float32)
        # eps is the perturbation VECTOR norm: per-dim std eps/sqrt(D)
        # (bits/127 has std 0.5774) -> cos(q, planted) ~ 1/sqrt(1+eps^2)
        planted = q[qidx] + jnp.float32(
            eps / (0.5774 * math.sqrt(dims))
        ) * pn / 127.0
        rows = jnp.where((ids < NQ * k)[:, None], planted, base)
        return _unit(rows)

    return block_rows, queries


# ----------------------------------------------------------------- prep

def prep(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp

    centers, block_rows, queries = make_gen(
        args.dims, args.centers, args.noise, args.seed
    )
    q = np.asarray(queries(centers))                       # [NQ, D] unit
    gen = jax.jit(functools.partial(block_rows, n_rows=BLOCK))

    best_s = np.full((NQ, args.k), -np.inf, np.float32)
    best_i = np.full((NQ, args.k), -1, np.int64)
    start_block = 0
    part = args.out + ".part.npz"
    if os.path.exists(part):                # resume a killed prep: the
        z = np.load(part)                   # running top-k is the whole
        if int(z["n"]) == args.n and int(z["seed"]) == args.seed:
            best_s, best_i = z["best_s"], z["best_i"]
            start_block = int(z["blocks"])
            rep(stage="prep_resume", from_block=start_block)
    t0 = time.perf_counter()
    nblocks = -(-args.n // BLOCK)
    for i in range(start_block, nblocks):
        rows = np.asarray(gen(centers, i))                 # [B, D] unit
        lo = i * BLOCK
        if lo + BLOCK > args.n:                            # tail mask
            rows = rows[: args.n - lo]
        sc = q @ rows.T                                    # cosine sims
        top = np.argpartition(-sc, min(args.k, rows.shape[0] - 1), axis=1)[
            :, : args.k
        ]
        tv = np.take_along_axis(sc, top, axis=1)
        cat_s = np.concatenate([best_s, tv], axis=1)
        cat_i = np.concatenate([best_i, top + lo], axis=1)
        sel = np.argsort(-cat_s, axis=1)[:, : args.k]
        best_s = np.take_along_axis(cat_s, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
        if (i + 1) % 8 == 0 or i == nblocks - 1:
            rep(stage="prep_progress", blocks=i + 1, of=nblocks,
                seconds=round(time.perf_counter() - t0, 1))
            tmp = part + ".tmp.npz"
            np.savez(tmp, best_s=best_s, best_i=best_i, blocks=i + 1,
                     n=args.n, seed=args.seed)
            os.replace(tmp, part)
    if os.path.exists(part):
        os.remove(part)
    np.savez(
        args.out, queries=q, oracle=best_i, n=args.n, dims=args.dims,
        centers=args.centers, noise=args.noise, seed=args.seed, k=args.k,
    )
    rep(stage="prep_done", out=args.out,
        seconds=round(time.perf_counter() - t0, 1))


# ------------------------------------------------------------------ run

def run(args) -> None:
    import jax
    import jax.numpy as jnp

    from embeddinghub_tpu.index import flat as flat_mod
    from embeddinghub_tpu.index.flat import FlatIndex

    if args.planted > 0:
        # oracle known by construction — no CPU prep pass needed
        pgen, pqueries = make_planted_gen(
            args.dims, args.seed, args.k, args.planted
        )
        q = np.asarray(pqueries())
        oracle = np.arange(NQ * args.k).reshape(NQ, args.k)
        centers = jnp.asarray(q)      # the gen state the fill closes over
        block_rows = pgen
    elif args.no_recall:
        # warm pass: compile+cache the fill/query programs for this
        # arena shape while the CPU oracle prep is still running (the
        # persistent compile cache is shared across processes)
        q, oracle = None, None
        centers, block_rows, _ = make_gen(
            args.dims, args.centers, args.noise, args.seed
        )
    else:
        z = np.load(args.oracle)
        assert int(z["n"]) == args.n and int(z["dims"]) == args.dims, (
            "oracle file was prepped for a different arena config"
        )
        q, oracle = z["queries"], z["oracle"]
        centers, block_rows, _ = make_gen(
            args.dims, args.centers, args.noise, args.seed
        )

    t_all = time.perf_counter()
    residual = args.storage == "int8x2"

    idx = FlatIndex(
        args.dims, metric="cosine", capacity=args.n,
        storage_dtype=args.storage, quant_guard=False,
    )
    cap = idx.capacity
    rep(stage="init", backend=jax.default_backend(), n=args.n,
        dims=args.dims, capacity=cap, storage=args.storage,
        boost=args.boost,
        device_hbm_gb=round(
            cap * (args.dims * (2 if residual else 1) + 9) / 1e9, 2))

    # ---- device-side arena build: gen + quantize + staged write ----
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def fill(hi, lo, sq, sc, i, start):
        rows = block_rows(centers, i, BLOCK)               # unit rows f32
        s = jnp.maximum(jnp.max(jnp.abs(rows), axis=1) / 127.0, 1e-30)
        h = jnp.clip(jnp.round(rows / s[:, None]), -127, 127)
        hi = jax.lax.dynamic_update_slice_in_dim(
            hi, h.astype(jnp.int8), start, 0)
        if residual:
            r = rows / s[:, None] - h
            l8 = jnp.clip(jnp.round(r * 254.0), -127, 127)
            lo = jax.lax.dynamic_update_slice_in_dim(
                lo, l8.astype(jnp.int8), start, 0)
        sq = jax.lax.dynamic_update_slice_in_dim(
            sq, jnp.einsum("nd,nd->n", rows, rows), start, 0)
        sc = jax.lax.dynamic_update_slice_in_dim(sc, s, start, 0)
        return hi, lo, sq, sc

    t0 = time.perf_counter()
    hi = flat_mod._deep_alloc(cap, args.dims, "int8")
    lo = flat_mod._deep_alloc(cap, args.dims, "int8") if residual else \
        jnp.zeros((1, 1), jnp.int8)
    sq = jnp.zeros((cap,), jnp.float32)
    sc = jnp.full((cap,), 1e-30, jnp.float32)
    nblocks = cap // BLOCK
    for i in range(nblocks):
        hi, lo, sq, sc = fill(hi, lo, sq, sc, jnp.int32(i),
                              jnp.int32(i * BLOCK))
    valid = np.zeros((cap,), bool)
    valid[: args.n] = True
    dvalid = jax.device_put(valid)
    jax.block_until_ready(hi)
    rep(stage="device_build", blocks=nblocks,
        seconds=round(time.perf_counter() - t0, 1),
        rows_per_s=round(cap / (time.perf_counter() - t0)))

    # ---- adopt into the index shell (device-authoritative arena) ----
    idx._dx, idx._dx_sq, idx._dscales, idx._dvalid = hi, sq, sc, dvalid
    idx._dx_lo = lo if residual else None
    idx._hvalid[: args.n] = True
    idx._size = args.n
    idx._needs_full_sync = False
    idx._dirty_rows.clear()
    idx.oversample_boost = args.boost

    # ---- query throughput (wire-inclusive, int8 query upload) ----
    qpad = np.zeros((args.batch, args.dims), np.float32)
    if q is not None:
        qpad[:NQ] = q
    else:
        qpad[:] = np.random.default_rng(3).standard_normal(
            (args.batch, args.dims)).astype(np.float32)
    t0 = time.perf_counter()
    idx.search(qpad, args.k, with_distances=False, query_dtype="bfloat16")
    rep(stage="first_query", seconds=round(time.perf_counter() - t0, 1),
        note="includes the chunked-search XLA compile")
    t0 = time.perf_counter()
    for _ in range(args.qbatches):
        _, ii = idx.search(qpad, args.k, with_distances=False,
                           query_dtype="bfloat16")
    t_q = time.perf_counter() - t0
    rep(stage="query", batch=args.batch, batches=args.qbatches,
        qps=round(args.batch * args.qbatches / t_q, 1),
        ms_per_batch=round(t_q / args.qbatches * 1e3, 1))

    # ---- recall@k vs the prep oracle ----
    if oracle is None:
        rep(stage="no_recall_warm_pass_done",
            total_process_seconds=round(time.perf_counter() - t_all, 1))
        return
    _, got = idx.search(qpad, args.k, with_distances=False)
    got = np.asarray(got)[:NQ]
    recall = float(np.mean([
        len(set(got[i].tolist()) & set(oracle[i].tolist())) / args.k
        for i in range(NQ)
    ]))
    rep(stage="recall", queries=NQ, k=args.k, storage=args.storage,
        boost=args.boost, recall_at_k=round(recall, 4),
        total_process_seconds=round(time.perf_counter() - t_all, 1))

    # ---- streaming inserts into the live deep arena (optional) ----
    if args.stream:
        rng = np.random.default_rng(9)
        cn = np.asarray(centers)
        wave = 8192
        free = cap - args.n
        n_ins = min(args.stream, free)
        if n_ins < args.stream:
            rep(stage="stream_note", capped_to=n_ins,
                note="arena rounds to 1M blocks; inserting into the pad")
        t0 = time.perf_counter()
        for s in range(0, n_ins, wave):
            c = min(wave, n_ins - s)
            a = rng.integers(0, len(cn), c)
            rows = cn[a] + args.noise * rng.standard_normal(
                (c, args.dims)).astype(np.float32)
            idx.add(np.arange(args.n + s, args.n + s + c),
                    rows.astype(np.float32))
            idx._sync()  # delta scatter, like a live server
        jax.block_until_ready(idx._dx)
        t_st = time.perf_counter() - t0
        rep(stage="stream_insert", rows=n_ins, wave=wave,
            rows_per_s=round(n_ins / t_st, 1), seconds=round(t_st, 1))
        # streamed rows must be findable (self-recall on a sample)
        sample = rng.integers(args.n, args.n + n_ins, 64)
        sq = idx._hx[sample]
        _, si = idx.search(
            np.concatenate(
                [sq, np.zeros((args.batch - 64, args.dims), np.float32)]
            ), args.k)
        hit = float(np.mean([
            sample[i] in np.asarray(si)[i] for i in range(64)
        ]))
        rep(stage="stream_verify", self_recall=round(hit, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--n", type=int, default=50_000_000)
    ap.add_argument("--dims", type=int, default=96)
    ap.add_argument("--centers", type=int, default=1024)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--qbatches", type=int, default=8)
    ap.add_argument("--storage", default="int8x2",
                    choices=["int8", "int8x2"])
    ap.add_argument("--boost", type=int, default=1)
    ap.add_argument("--planted", type=float, default=0.0,
                    help="planted-neighbor mode: eps of the k planted "
                         "rows per query (oracle by construction, no "
                         "--prep needed); 0 = clustered generator")
    ap.add_argument("--no-recall", action="store_true",
                    help="skip oracle load + recall (compile-warming "
                         "pass while the CPU oracle prep runs)")
    ap.add_argument("--stream", type=int, default=0,
                    help="streaming-insert rows to measure after the "
                         "query/recall stages (run leg only)")
    ap.add_argument("--out", default="/tmp/devgen_oracle.npz")
    ap.add_argument("--oracle", default="/tmp/devgen_oracle.npz")
    args = ap.parse_args()
    if args.prep:
        prep(args)
    elif args.run:
        run(args)
    else:
        raise SystemExit("pass --prep (CPU) or --run (TPU)")


if __name__ == "__main__":
    main()
