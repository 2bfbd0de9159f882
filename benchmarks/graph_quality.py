"""Graph-quality diagnostic: where does the bulk-build recall gap live?

Separates the two suspects VERDICT r1 conflated:
  * the TPU beam-search kernel (search semantics), by running it over a
    *gold* graph built by the sequential CPU HNSW (native CpuHnsw);
  * the bulk NN-descent graph structure, by running the same kernel over
    the bulk-built graph.

If beam-on-gold ~= cpu-search-on-gold, the kernel is fine and the gap is
purely graph structure (the roadmap-1b hypothesis).

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/graph_quality.py \
      --n 50000 --dims 128 --efs 100
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

from benchmarks.recall_sweep import ground_truth, load_data, recall  # noqa: E402


def import_cpu_graph(h, train, m):
    """Load a CpuHnsw's graph into an HNSWIndex (same row ids)."""
    from embeddinghub_tpu.index.hnsw import HNSWIndex

    n, dims = train.shape
    idx = HNSWIndex(dims, metric="l2", m=m, capacity=n)
    idx._hx[:n] = train
    idx._hvalid[:n] = True
    idx._levels[:n] = h.levels()
    idx._nb0[:n] = h.links_layer(0, idx.m0)
    for layer in range(1, h.max_level + 1):
        tbl = h.links_layer(layer, m)
        nodes = np.flatnonzero(idx._levels[:n] >= layer)
        idx._upper[layer] = {
            int(r): [int(v) for v in tbl[r] if v >= 0] for r in nodes
        }
    idx._entry = h.entry
    idx._max_level = h.max_level
    idx._size = n
    return idx


def degree_stats(nb0):
    deg = (nb0 >= 0).sum(1)
    return dict(
        deg_mean=round(float(deg.mean()), 2),
        deg_p10=int(np.percentile(deg, 10)),
        deg_p50=int(np.percentile(deg, 50)),
        deg_p90=int(np.percentile(deg, 90)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--efs", default="100")
    ap.add_argument("--data", default=None)
    ap.add_argument("--sift-like", action="store_true", dest="sift_like", default=True)
    ap.add_argument("--random", dest="sift_like", action="store_false")
    ap.add_argument("--clustered", action="store_true", default=False)
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-bulk", action="store_true")
    args = ap.parse_args()
    args.metric = "l2"

    train, test, gt = load_data(args)
    if gt is None:
        gt = ground_truth(train, test, args.k, "l2")
    efs = [int(e) for e in args.efs.split(",")]
    n = len(train)

    def rep(**kv):
        print(json.dumps(kv), flush=True)

    if not args.skip_cpu:
        from embeddinghub_tpu.native import CpuHnsw

        t0 = time.perf_counter()
        h = CpuHnsw(args.dims, m=args.m, ef_construction=args.efc)
        h.add(train)
        cpu_build = time.perf_counter() - t0
        gold = import_cpu_graph(h, train, args.m)
        rep(graph="cpu-gold", build_s=round(cpu_build, 1),
            **degree_stats(gold._nb0[:n]))
        for ef in efs:
            _, ids = h.search(test, args.k, ef=ef)
            rep(graph="cpu-gold", search="cpu", ef=ef,
                recall=round(recall(ids, gt, args.k), 4))
            gold.search(test[:8], args.k, ef=ef)  # warm
            t0 = time.perf_counter()
            _, ids = gold.search(test, args.k, ef=ef)
            dt = time.perf_counter() - t0
            rep(graph="cpu-gold", search="tpu-beam", ef=ef,
                recall=round(recall(ids, gt, args.k), 4),
                qps=round(len(test) / dt, 1))

    if not args.skip_bulk:
        from embeddinghub_tpu.index.hnsw import HNSWIndex

        t0 = time.perf_counter()
        idx = HNSWIndex(args.dims, metric="l2", m=args.m,
                        ef_construction=args.efc, capacity=n)
        idx.add(np.arange(n), train)
        bulk_build = time.perf_counter() - t0
        rep(graph="bulk", build_s=round(bulk_build, 1),
            **degree_stats(idx._nb0[:n]))
        for ef in efs:
            idx.search(test[:8], args.k, ef=ef)  # warm
            t0 = time.perf_counter()
            _, ids = idx.search(test, args.k, ef=ef)
            dt = time.perf_counter() - t0
            rep(graph="bulk", search="tpu-beam", ef=ef,
                recall=round(recall(ids, gt, args.k), 4),
                qps=round(len(test) / dt, 1))


if __name__ == "__main__":
    main()
