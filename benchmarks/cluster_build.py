"""Cluster-routed graph construction at scale (the >2M rows/chip path).

Measures the sub-quadratic build (k-means-routed candidate pools +
graph refine rounds, ``index/hnsw._cluster_build_fwd``) on the
SIFT-descriptor-statistics proxy: build wall-clock + recall@10 at an
efSearch sweep against a TPU exact-scan ground truth.  VERDICT r2
item 1's bar: recall@10 >= 0.95 @ef100 at 4M rows, M=16/efC=200.

Usage (real TPU):
  python benchmarks/cluster_build.py --n 4000000 --efs 50,100,200
  python benchmarks/cluster_build.py --n 1000000 --force-cluster \
      --efs 100   # compare against the exact build's 0.9610 @ef100
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


def report(**kv):
    print(json.dumps(kv), flush=True)


def sift_desc_chunked(n: int, nq: int, dims: int):
    """sift-desc proxy sampled in chunks (the generator's float64
    intermediates would be ~20 GB at 4M in one shot).  Same statistics
    as recall_sweep.load_data's sift-desc mode, drawn from one rng so
    chunks don't repeat."""
    import numpy as _np

    chunk = 1 << 18
    rng = _np.random.default_rng(0)
    qrng = _np.random.default_rng(1)

    def sample_desc(count, r):
        base_ori = r.uniform(0, 8, size=(count, 1, 1))
        drift = r.normal(0, 1.2, size=(count, 4, 4)).cumsum(2)
        ori = (base_ori + drift) % 8
        bins = _np.arange(8)[None, None, None, :]
        ang = _np.minimum(
            _np.abs(bins - ori[..., None]), 8 - _np.abs(bins - ori[..., None])
        )
        resp = _np.exp(-(ang ** 2) / (2 * 1.1 ** 2))
        energy = r.gamma(2.0, 1.0, size=(count, 4, 4, 1))
        noise = r.gamma(1.0, 0.25, size=(count, 4, 4, 8))
        d = (resp * energy + noise).reshape(count, 128)
        d /= _np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
        d = _np.minimum(d, 0.2)
        d /= _np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
        return _np.floor(512.0 * d).astype(_np.float32)

    train = _np.empty((n, dims), _np.float32)
    done = 0
    while done < n:
        c = min(chunk, n - done)
        train[done : done + c] = sample_desc(c, rng)
        done += c
        print(f"  data {done}/{n}", flush=True)
    test = sample_desc(nq, qrng)
    return train, test


def tpu_ground_truth(train, test, k):
    """Exact f32 L2 top-k on device, chunked over rows (HIGHEST
    precision matmul; at 4M rows a host oracle would take ~an hour on
    the single-core VM).  The running top-k lives ON DEVICE — only the
    final [nq, k] ids cross the wire (the r3a version read back every
    chunk's full [nq, chunk] score block: 537 MB/chunk on the 35 MB/s
    tunnel, ~100 s/chunk; now the per-chunk wire cost is the 134 MB
    chunk upload only)."""
    import jax
    import jax.numpy as jnp

    n, d = train.shape
    nq = test.shape[0]
    chunk = 1 << 18

    @jax.jit
    def merge(best_s, best_i, xc, q, base):
        dots = jax.lax.dot_general(
            q, xc, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        xsq = jnp.einsum("nd,nd->n", xc, xc,
                         precision=jax.lax.Precision.HIGHEST)
        sc = 2.0 * dots - xsq[None, :]  # monotone in -L2
        ids = base + jnp.broadcast_to(
            jnp.arange(xc.shape[0], dtype=jnp.int32)[None, :], sc.shape
        )
        cand_s = jnp.concatenate([best_s, sc], axis=1)
        cand_i = jnp.concatenate([best_i, ids], axis=1)
        top_s, pos = jax.lax.top_k(cand_s, k)
        return top_s, jnp.take_along_axis(cand_i, pos, axis=1)

    qd = jnp.asarray(test)
    best_s = jnp.full((nq, k), -jnp.inf, jnp.float32)
    best_i = jnp.full((nq, k), -1, jnp.int32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        xc = train[s:e]
        if e - s < chunk:  # pad the tail so the jit shape stays stable
            xc = np.concatenate(
                [xc, np.full((chunk - (e - s), d), 1e18, np.float32)]
            )
        best_s, best_i = merge(
            best_s, best_i, jnp.asarray(xc), qd, jnp.int32(s)
        )
        print(f"  gt {e}/{n}", flush=True)
    gt = np.asarray(best_i).astype(np.int64)
    assert (gt < n).all() and (gt >= 0).all()
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--nq", type=int, default=512)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--efs", default="50,100,200")
    ap.add_argument("--target", type=int, default=4096)
    ap.add_argument("--probes", type=int, default=8)
    ap.add_argument("--refine", type=int, default=0,
                    help="graph-walk refine rounds (gather-bound, "
                         "~460s/262k rows/round at 1M; default off)")
    ap.add_argument("--repair-frac", type=float, default=0.5,
                    help="boundary-repair fraction (exact full-arena "
                         "pools for the lowest-routing-margin rows)")
    ap.add_argument("--force-cluster", action="store_true",
                    help="route through the cluster build below 2M")
    ap.add_argument("--seed-probes", type=int, default=0,
                    help="after the classic sweep, enable centroid-"
                         "routed multi-entry beam seeding "
                         "(HNSWIndex.build_route) and sweep again")
    ap.add_argument("--exact", action="store_true",
                    help="force the exact O(n^2)-pool build past 2M — "
                         "the quality-ceiling referee for the cluster "
                         "path at a given n")
    ap.add_argument("--stream", type=int, default=0,
                    help="after the sweep, stream this many fresh rows "
                         "through the fused wave path and re-measure "
                         "recall vs an updated ground truth")
    ap.add_argument("--save-index", default=None,
                    help="after the build, np.savez the graph's "
                         "state_arrays here (reruns skip the build)")
    ap.add_argument("--load-index", default=None,
                    help="skip the build: restore a graph saved with "
                         "--save-index (HNSWIndex.from_state)")
    ap.add_argument("--gt-file", default=None,
                    help="npz cache for train/test/gt")
    ap.add_argument("--data-file", default=None,
                    help="npz cache for train/test only (lets the "
                         "CPU-bound data gen run ahead of the TPU run)")
    ap.add_argument("--gt-only", action="store_true",
                    help="exit after writing --gt-file (stage split for "
                         "the ~10-min harness cap on TPU processes)")
    ap.add_argument("--skip-sweep", action="store_true",
                    help="skip the ef sweep (each ef is its own multi-"
                         "minute remote compile; stage split as above)")
    args = ap.parse_args()

    from embeddinghub_tpu.index.hnsw import HNSWIndex

    t0 = time.time()
    if args.gt_file and os.path.exists(args.gt_file):
        z = np.load(args.gt_file)
        train, test, gt = z["train"], z["test"], z["gt"]
        print(f"loaded {args.gt_file}", flush=True)
    else:
        if args.data_file and os.path.exists(args.data_file):
            z = np.load(args.data_file)
            train, test = z["train"], z["test"]
            print(f"loaded data {args.data_file}", flush=True)
        else:
            train, test = sift_desc_chunked(args.n, args.nq, args.dims)
            print(f"data ready in {time.time()-t0:.0f}s", flush=True)
            if args.data_file:
                np.savez(args.data_file, train=train, test=test)
        t0 = time.time()
        gt = tpu_ground_truth(train, test, args.k)
        print(f"ground truth in {time.time()-t0:.0f}s", flush=True)
        if args.gt_file:
            np.savez(args.gt_file, train=train, test=test, gt=gt)
    if args.gt_only:
        report(event="gt_only_done", path=args.gt_file)
        return

    if args.load_index:
        z = np.load(args.load_index)
        idx = HNSWIndex.from_state(
            args.dims, "l2", {k: z[k] for k in z.files}
        )
        build_s = 0.0
        report(event="load", path=args.load_index, n=int(idx.size))
    else:
        idx = HNSWIndex(args.dims, metric="l2", m=args.m,
                        ef_construction=args.efc, capacity=args.n)
        if args.force_cluster:
            idx.exact_build_max = 1024
        if args.exact:
            idx.exact_build_max = args.n + 1
        idx.cluster_target = args.target
        idx.cluster_probes = args.probes
        idx.cluster_refine_rounds = args.refine
        idx.cluster_repair_frac = args.repair_frac

        t0 = time.time()
        idx.add(np.arange(args.n), train)
        build_s = time.time() - t0
        report(event="build", n=args.n, target=args.target,
               probes=args.probes, refine=args.refine,
               repair_frac=args.repair_frac, build_s=round(build_s, 1),
               stats=getattr(idx, "_cluster_stats", None))
        if args.save_index:
            t0 = time.time()
            np.savez(args.save_index, **idx.state_arrays())
            report(event="save", path=args.save_index,
                   save_s=round(time.time() - t0, 1))

    base_engine = "hnsw-exact" if args.exact else "hnsw-cluster"

    def sweep(tag):
        for ef in [int(e) for e in args.efs.split(",")]:
            idx.search(test[:8], args.k, ef=ef)  # warm
            t0 = time.time()
            _, ids = idx.search(test, args.k, ef=ef)
            dt = time.time() - t0
            report(engine=tag, n=args.n, m=args.m, efc=args.efc,
                   ef=ef, recall=round(recall(ids, gt, args.k), 4),
                   qps=round(len(test) / dt, 1), build_s=round(build_s, 1))

    if not args.skip_sweep:
        sweep(base_engine)

    if args.seed_probes:
        # centroid-routed multi-entry search: same graph, same ef —
        # only the beam's starting set changes (HNSWIndex.build_route)
        t0 = time.time()
        idx.build_route(seed_probes=args.seed_probes)
        report(event="route", seed_probes=args.seed_probes,
               route_s=round(time.time() - t0, 1))
        sweep(base_engine + "+seed")
        idx.seed_probes = 0  # stream leg compares against the classic path

    if args.stream:
        stream_into(idx, train, test, gt, args)


def stream_into(idx, train, test, gt, args):
    """VERDICT r3 item 7: stream fresh rows into the cluster-built base
    via the fused wave path (ops/wave_insert) and verify both axes —
    insert throughput holds at >1M base, and recall holds against a
    ground truth UPDATED for the streamed rows (host brute-force over
    the streamed block merged with the cached device GT; the reference
    serializes every insert behind one global mutex,
    embeddingstore/server.h:65)."""
    n, k = args.n, args.k
    rng = np.random.default_rng(12345)
    new = sample_stream_rows(rng, args.stream, train.shape[1])
    t0 = time.time()
    for s in range(0, len(new), 4096):
        rows = np.arange(n + s, n + min(s + 4096, len(new)))
        idx.add(rows, new[s : s + len(rows)])
    dt = time.time() - t0
    report(event="stream", base=n, streamed=len(new),
           inserts_per_s=round(len(new) / dt, 1))

    # self-hit: a streamed row queried back must find itself at top-1
    probe = new[:: max(1, len(new) // 256)][:256]
    rows = np.arange(n, n + len(new))[:: max(1, len(new) // 256)][:256]
    _, ids = idx.search(probe, 1, ef=64)
    self_hit = float(np.mean(ids[:, 0] == rows))

    # merged ground truth on host: cached device GT ++ streamed block
    def l2(q, x):
        return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)

    d_old = np.stack([l2(test[i : i + 1], train[gt[i]])[0]
                      for i in range(len(test))])
    d_new = np.empty((len(test), len(new)), np.float32)
    for s in range(0, len(new), 16384):
        d_new[:, s : s + 16384] = l2(test, new[s : s + 16384])
    cand_d = np.concatenate([d_old, d_new], axis=1)
    cand_i = np.concatenate(
        [gt, np.broadcast_to(np.arange(n, n + len(new)), (len(test), len(new)))],
        axis=1,
    )
    pos = np.argsort(cand_d, axis=1)[:, :k]
    gt2 = np.take_along_axis(cand_i, pos, axis=1)

    _, ids = idx.search(test, k, ef=100)
    report(event="stream-quality", base=n, streamed=len(new),
           self_hit=round(self_hit, 4),
           recall_ef100=round(recall(ids, gt2, k), 4))


def sample_stream_rows(rng, count, dims):
    """Fresh rows from the same SIFT-descriptor statistics as the base
    (sift_desc_chunked's generator with an independent rng)."""
    chunks = []
    left = count
    while left:
        c = min(1 << 17, left)
        base_ori = rng.uniform(0, 8, size=(c, 1, 1))
        drift = rng.normal(0, 1.2, size=(c, 4, 4)).cumsum(2)
        ori = (base_ori + drift) % 8
        bins = np.arange(8)[None, None, None, :]
        ang = np.minimum(np.abs(bins - ori[..., None]),
                         8 - np.abs(bins - ori[..., None]))
        resp = np.exp(-(ang ** 2) / (2 * 1.1 ** 2))
        energy = rng.gamma(2.0, 1.0, size=(c, 4, 4, 1))
        noise = rng.gamma(1.0, 0.25, size=(c, 4, 4, 8))
        d = (resp * energy + noise).reshape(c, 128)
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
        d = np.minimum(d, 0.2)
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
        chunks.append(np.floor(512.0 * d).astype(np.float32)[:, :dims])
        left -= c
    return np.concatenate(chunks)


if __name__ == "__main__":
    main()
