"""On-device graph-serving truth: beam-search device latency/QPS at 1M
rows (VERDICT r2 item 2).

Builds (or loads from the npz cache) the 1M SIFT-proxy HNSW graph —
the same exact-scan construction RESULTS.md's parity table uses
(M=16/efC=200) — then measures the fused full-graph search
(`ops/wave_insert.make_graph_search`: upper-layer greedy descent +
layer-0 beam in one dispatch) with the two-point in-jit fori_loop
method from benchmarks/ondevice.py, so dispatch/tunnel/readback cancel.

Reported per (ef, expand, vec dtype):
  * device ms / on-device QPS for a 1024-query batch;
  * measured layer-0 hop count (`beam_search(..., with_hops=True)`);
  * gather-bandwidth estimate: hops x B x expand x M x D x itemsize —
    the neighbor-vector gathers that dominate the walk (reference hot
    loop: embeddingstore/index.cc:41-51 does the same fetches
    pointer-chased one query at a time);
  * recall@10 vs the exact ground truth (from the cluster_build cache).

Usage (real TPU; graph cached after the first run):
  python benchmarks/graph_ondevice.py --gt-file /tmp/cb_1m.npz \
      --graph-file /tmp/ehtpu_graph_1m.npz --efs 50,100 --expands 4,8
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.recall_sweep import recall  # noqa: E402

PEAK_HBM_GBS = 819.0


def report(**kv):
    print(json.dumps(kv), flush=True)


def load_or_build(args):
    from benchmarks.cluster_build import sift_desc_chunked, tpu_ground_truth
    from embeddinghub_tpu.index.hnsw import HNSWIndex

    if args.gt_file and os.path.exists(args.gt_file):
        z = np.load(args.gt_file)
        train, test, gt = z["train"], z["test"], z["gt"]
        print(f"loaded data+gt {args.gt_file}", flush=True)
    else:
        train, test = sift_desc_chunked(args.n, args.nq, 128)
        gt = tpu_ground_truth(train, test, args.k)
        if args.gt_file:
            np.savez(args.gt_file, train=train, test=test, gt=gt)

    if args.graph_file and os.path.exists(args.graph_file):
        z = np.load(args.graph_file, allow_pickle=True)
        arrays = {k: z[k] for k in z.files}
        idx = HNSWIndex.from_state(128, "l2", arrays)
        print(f"loaded graph {args.graph_file} (n={idx.size})", flush=True)
    else:
        idx = HNSWIndex(128, metric="l2", m=args.m,
                        ef_construction=args.efc, capacity=len(train))
        t0 = time.time()
        idx.add(np.arange(len(train)), train)
        report(event="build", n=len(train), build_s=round(time.time() - t0, 1))
        if args.graph_file:
            np.savez(args.graph_file, **idx.state_arrays())
    return idx, train, test, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--efs", default="50,100")
    ap.add_argument("--expands", default="4,8")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--specs", default="1",
                    help="speculative hop depths to sweep (beam_search "
                         "spec=2: two graph hops per loop iteration)")
    ap.add_argument("--exit-ks", default="0",
                    help="early-exit bars to sweep (0 = full-ef "
                         "hnswlib semantics)")
    ap.add_argument("--gt-file", default="/tmp/cb_1m.npz")
    ap.add_argument("--graph-file", default="/tmp/ehtpu_graph_1m.npz")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--fused", action="store_true",
                    help="augment_arena single-gather fetch (fold x_sq "
                         "+ valid into trailing arena columns)")
    ap.add_argument("--packed", action="store_true",
                    help="pack_neighbors block-gather fetch (implies "
                         "--fused for seeds/descent; int8 phase-1)")
    args = ap.parse_args()
    if args.packed:
        args.fused = True

    import jax
    import jax.numpy as jnp

    from benchmarks.ondevice import device_seconds
    from embeddinghub_tpu.ops import beam as beam_ops

    idx, train, test, gt = load_or_build(args)
    state = idx._device_arrays()
    b = args.batch
    q = np.zeros((b, 128), np.float32)
    nrep = -(-b // len(test))
    q[:] = np.tile(test, (nrep, 1))[:b]
    qd = jnp.asarray(q)
    entry = jnp.int32(idx._entry)
    backend = jax.default_backend()

    for dt_name in args.dtypes.split(","):
        x = state["x"]
        if dt_name == "bf16":
            x = x.astype(jnp.bfloat16)
        if args.fused:
            x = beam_ops.augment_arena(
                x, state["x_sq"], state["valid"], "l2"
            )
            x = jax.block_until_ready(x)
        packed = dscale = None
        if args.packed:
            t0 = time.time()
            packed, dscale = beam_ops.pack_neighbors(
                state["x"], state["nb0"]
            )
            packed = jax.block_until_ready(packed)
            report(event="pack", seconds=round(time.time() - t0, 1),
                   bytes=int(packed.size))
        for ef in [int(e) for e in args.efs.split(",")]:
            for expand, spec, exit_k in [
                (e2, s2, x2)
                for e2 in [int(v) for v in args.expands.split(",")]
                for s2 in [int(v) for v in args.specs.split(",")]
                for x2 in [int(v) for v in args.exit_ks.split(",")]
            ]:
                def gsearch(qq, nb0, ustack, xx, x_sq, valid,
                            pk=None, ds=None):
                    if args.fused:
                        x_sq = valid = None
                    cur = jnp.full((b,), entry, jnp.int32)
                    for layer in range(ustack.shape[0], 0, -1):
                        cur = beam_ops.greedy_descend(
                            qq, cur, ustack[layer - 1], xx, x_sq,
                            metric="l2")
                    return beam_ops.beam_search(
                        qq, cur, nb0, xx, x_sq, valid, metric="l2",
                        ef=ef, expand=expand, max_hops=2 * ef + 64,
                        spec=spec, exit_k=exit_k,
                        packed=pk, dscale=ds)

                rest = (state["nb0"], state["ustack"], x,
                        state["x_sq"], state["valid"])
                if args.packed:
                    rest = rest + (packed, dscale)
                dt = device_seconds(
                    lambda qq, *r: gsearch(qq, *r), qd, rest, args.reps)

                # hops + recall from one instrumented dispatch
                i_sq = None if args.fused else state["x_sq"]
                i_valid = None if args.fused else state["valid"]
                cur = jnp.full((b,), entry, jnp.int32)
                for layer in range(state["ustack"].shape[0], 0, -1):
                    cur = beam_ops.greedy_descend(
                        qd, cur, state["ustack"][layer - 1], x,
                        i_sq, metric="l2")
                dd, ids, hops = beam_ops.beam_search(
                    qd, cur, state["nb0"], x, i_sq,
                    i_valid, metric="l2", ef=ef, expand=expand,
                    max_hops=2 * ef + 64, with_hops=True,
                    spec=spec, exit_k=exit_k,
                    packed=packed, dscale=dscale)
                hops = int(hops)
                if args.packed:
                    # serving reranks the read rows exactly (f32); int8
                    # phase-1 order alone would understate recall
                    kk = min(2 * args.k, ids.shape[1])
                    cand = np.asarray(ids)[: len(test), :kk]
                    safe = np.maximum(cand, 0)
                    dex = (
                        np.einsum("nd,nd->n", train[safe.ravel()],
                                  train[safe.ravel()]).reshape(safe.shape)
                        - 2.0 * np.einsum(
                            "qkd,qd->qk", train[safe], test)
                    )
                    dex[cand < 0] = np.inf
                    order = np.argsort(dex, axis=1)[:, : args.k]
                    ids_np = np.take_along_axis(cand, order, axis=1)
                else:
                    ids_np = np.asarray(ids)[: len(test), : args.k]
                rec = recall(ids_np, gt, args.k)

                gather_bytes = (
                    hops * b * expand * spec * idx.m0 * 128
                    * x.dtype.itemsize
                )
                report(
                    kernel="graph_beam_1M", backend=backend,
                    vec_dtype=dt_name, ef=ef, expand=expand,
                    spec=spec, exit_k=exit_k,
                    device_ms=round(dt * 1e3, 2),
                    qps_on_device=round(b / dt, 1),
                    hops=hops,
                    recall=round(rec, 4),
                    gather_gbs=round(gather_bytes / dt / 1e9, 1),
                    gather_util=round(
                        gather_bytes / dt / 1e9 / PEAK_HBM_GBS, 3),
                )


if __name__ == "__main__":
    main()
