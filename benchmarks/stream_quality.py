"""Streamed-graph recall: bulk-build a base, stream the rest via the
fused wave-insert path, then measure recall@10 of the COMBINED graph
against exact ground truth.  Validates that wave inserts (masked-scan
candidate pools, ops/wave_insert.py) produce hnswlib-grade link quality,
not just self-retrievability (reference write path: version.cc:47-56 ->
index.cc:20-37).

Usage:
  python benchmarks/stream_quality.py --base 50000 --stream 45000
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=50_000)
    ap.add_argument("--stream", type=int, default=45_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--efs", default="50,100")
    args = ap.parse_args()

    class A:
        pass

    a = A()
    a.data = None
    a.sift_like = True
    a.clustered = False
    a.n = args.base + args.stream
    a.nq = args.nq
    a.dims = args.dims
    a.k = args.k
    a.metric = "l2"
    train, test, _ = load_data(a)
    gt = ground_truth(train, test, args.k, "l2")

    from embeddinghub_tpu.index.hnsw import HNSWIndex

    idx = HNSWIndex(args.dims, m=args.m, ef_construction=args.efc,
                    capacity=len(train))
    t0 = time.perf_counter()
    idx.add(np.arange(args.base), train[: args.base])
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in range(args.base, len(train), args.batch):
        e = min(s + args.batch, len(train))
        idx.add(np.arange(s, e), train[s:e])
    if idx._device_state is not None:
        np.asarray(idx._device_state["nb0"][:1])
    stream_s = time.perf_counter() - t0
    for ef in [int(x) for x in args.efs.split(",")]:
        _, ids = idx.search(test, args.k, ef=ef)
        print(json.dumps({
            "phase": "streamed-graph", "base": args.base,
            "stream": args.stream, "ef": ef,
            "recall": round(recall(ids, gt, args.k), 4),
            "bulk_s": round(build_s, 1), "stream_s": round(stream_s, 1),
            "inserts_per_s": round(args.stream / stream_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
