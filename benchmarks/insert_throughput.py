"""Streaming-insert throughput: TPU HNSW wave inserts (delta device
sync) vs sequential CPU HNSW addPoint (reference write path:
``version.cc:47-56`` -> ``index.cc:20-37``).

Builds a base graph bulk, then streams batches of new rows, measuring
inserts/s and verifying the streamed rows are immediately searchable.

Usage:
  python benchmarks/insert_throughput.py --base 200000 --stream 20000
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

from benchmarks.recall_sweep import load_data  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=200_000)
    ap.add_argument("--stream", type=int, default=20_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--load-index", default=None,
                    help="saved HNSWIndex.state_arrays() npz for the "
                         "base graph (skips the in-process bulk build "
                         "— the dev harness caps TPU processes at "
                         "~10 min, under a 1M+ build)")
    ap.add_argument("--data-npz", default=None,
                    help="npz with train/test arrays matching the "
                         "loaded graph's source data")
    args = ap.parse_args()

    class A:
        pass

    a = A()
    a.data = None
    a.sift_like = True
    a.clustered = False
    a.n = args.base + args.stream
    a.nq = 256
    a.dims = args.dims
    a.k = 10
    a.metric = "l2"

    def rep(**kv):
        print(json.dumps(kv), flush=True)

    from embeddinghub_tpu.index.hnsw import HNSWIndex

    if args.data_npz:
        z = np.load(args.data_npz)
        train, test = z["train"], z["test"]
        if len(train) < args.base + args.stream:
            rng = np.random.default_rng(17)
            pick = rng.integers(0, len(train),
                                args.base + args.stream - len(train))
            extra = (train[pick]
                     + 2.0 * rng.standard_normal(
                         (pick.size, train.shape[1])
                     ).astype(np.float32))
            train = np.concatenate([train, extra])
    else:
        train, test, _ = load_data(a)
    base, stream = train[: args.base], train[args.base :]

    if args.load_index:
        zp = np.load(args.load_index, allow_pickle=True)
        idx = HNSWIndex.from_state(
            args.dims, "l2", {k: zp[k] for k in zp.files}
        )
        assert idx.size == args.base, (idx.size, args.base)
        # grow once BEFORE the timed stream (growth rebuilds device
        # state; mid-stream it would bill a full re-upload to a wave)
        idx._ensure_capacity(args.base + args.stream)
        idx.search(test[:8], 10, ef=100)
        rep(phase="loaded-base", n=idx.size, src=args.load_index)
    else:
        idx = HNSWIndex(args.dims, m=args.m, ef_construction=args.efc,
                        capacity=args.base + args.stream)
        t0 = time.perf_counter()
        idx.add(np.arange(args.base), base)
        idx.search(test[:8], 10, ef=100)  # force device state + compile
        rep(phase="bulk-base", n=args.base,
            build_s=round(time.perf_counter() - t0, 1))

    idx.search(test[:8], 10, ef=50)  # compile the check's search shape
    wave_s = []
    t0 = time.perf_counter()
    for s in range(0, len(stream), args.batch):
        rows = np.arange(args.base + s,
                         args.base + min(s + args.batch, len(stream)))
        tw = time.perf_counter()
        idx.add(rows, stream[s : s + args.batch])
        # force completion of the pipelined device wave (forced readback
        # — block_until_ready does not truly sync on the tunnel)
        if idx._device_state is not None:
            np.asarray(idx._device_state["nb0"][:1])
        wave_s.append(time.perf_counter() - tw)
    dt = time.perf_counter() - t0
    _, ids = idx.search(stream[:64], 1, ef=50)
    hit = float(np.mean(ids[:, 0] == np.arange(args.base, args.base + 64)))
    # wave 0 pays jit compile; steady-state excludes it when possible
    steady = wave_s[1:] or wave_s
    n_steady = (len(stream) - min(args.batch, len(stream))
                if len(wave_s) > 1 else len(stream))
    rep(phase="tpu-stream", n=len(stream), batch=args.batch,
        inserts_per_s=round(len(stream) / dt, 1),
        steady_inserts_per_s=round(n_steady / sum(steady), 1),
        wave_ms=[round(x * 1e3, 1) for x in wave_s],
        self_hit_at_1=round(hit, 3))

    if not args.skip_cpu:
        from embeddinghub_tpu.native import CpuHnsw

        h = CpuHnsw(args.dims, m=args.m, ef_construction=args.efc)
        t0 = time.perf_counter()
        h.add(base)
        rep(phase="cpu-base", n=args.base,
            build_s=round(time.perf_counter() - t0, 1))
        t0 = time.perf_counter()
        h.add(stream)
        dt = time.perf_counter() - t0
        rep(phase="cpu-stream", n=len(stream),
            inserts_per_s=round(len(stream) / dt, 1))


if __name__ == "__main__":
    main()
