"""Stream-grow a saved graph base by ~1M rows per (capped) process,
measuring steady-state insert throughput at each base size.

The dev harness caps TPU-attached processes at ~10 minutes — far under
a 4M cluster build — so the 4M insert-rate question (VERDICT r4 item 2:
1,067/s pre-fix, target >=2.5k/s or an attributed bound) is answered by
CHAINING wave-insert legs: each leg loads the saved state, streams the
next ~1M rows through the fused wave path (the real write path,
ops/wave_insert.make_wave_commit), reports the steady rate AT that base
size, and saves.  The rates along the way ARE the scaling curve; the
final graph also feeds wave_profile.py / insert_throughput.py at 4M.

Rows come from the same deterministic SIFT-proxy generator as the 1M
base (benchmarks/cluster_build.sift_desc_chunked), so the grown graph
stays a real, self-consistent index (self-recall checked per leg).

Usage (one leg per process):
  python benchmarks/stream_up.py --state /tmp/ehtpu_graph_1m.npz \
      --out /tmp/ehtpu_graph_2m.npz --to 2000000
Matches: the reference's sequential addPoint write path
(embeddinghub/embeddingstore/index.cc:20-37).
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


def rep(**kv):
    print(json.dumps(kv), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--to", type=int, required=True)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--budget", type=float, default=420.0,
                    help="hard PROCESS deadline for starting the save "
                         "(measured from process start, so compile and "
                         "load time count; the save itself needs "
                         "~90-150 s at 2-4M under the ~10 min cap)")
    args = ap.parse_args()
    t_proc = time.time()

    from benchmarks.cluster_build import sift_desc_chunked
    from embeddinghub_tpu.index.hnsw import HNSWIndex

    zp = np.load(args.state, allow_pickle=True)
    idx = HNSWIndex.from_state(
        args.dims, "l2", {k: zp[k] for k in zp.files}
    )
    base = idx.size
    rep(stage="loaded", size=base, target=args.to)
    if base >= args.to:
        rep(stage="already_there")
        return

    # deterministic rows [base, to) from the shared generator; a
    # pre-generated cache (np.save of the full train) keeps the CPU
    # generation out of the capped TPU-process budget
    t0 = time.time()
    cache = os.environ.get("EHTPU_TRAIN_CACHE", "/tmp/cb4m_train.npy")
    if os.path.exists(cache):
        full = np.load(cache, mmap_mode="r")
        assert len(full) >= args.to, (len(full), args.to)
        train = np.asarray(full[: args.to])
    else:
        train, _ = sift_desc_chunked(args.to, 8, args.dims)
    rows_np = train[base : args.to]
    rep(stage="rows_ready", n=len(rows_np),
        gen_s=round(time.time() - t0, 1))

    idx._ensure_capacity(args.to)
    idx.search(train[:8], 10, ef=100)        # device state + compiles
    rep(stage="warm")

    wave_s = []
    t_stream = time.time()
    done = 0
    for s in range(0, len(rows_np), args.batch):
        rows = np.arange(base + s, base + min(s + args.batch, len(rows_np)))
        tw = time.perf_counter()
        idx.add(rows, rows_np[s : s + args.batch])
        if idx._device_state is not None:    # forced wave sync
            np.asarray(idx._device_state["nb0"][:1])
        wave_s.append(time.perf_counter() - tw)
        done = s + len(rows)
        if time.time() - t_proc > args.budget:
            break
    steady = wave_s[1:] or wave_s
    n_steady = done - min(args.batch, done) if len(wave_s) > 1 else done
    rep(stage="leg", base=base, now=base + done,
        steady_inserts_per_s=round(n_steady / sum(steady), 1),
        waves=len(wave_s),
        wave_ms_median=round(1e3 * float(np.median(steady)), 1))

    # streamed rows must be findable by their own vector
    probe = np.arange(base, base + done, max(1, done // 64))[:64]
    _, got = idx.search(rows_np[probe - base], 1, ef=80)
    rep(stage="self_recall",
        at_1=round(float((got[:, 0] == probe).mean()), 3))

    t0 = time.time()
    arrs = idx.state_arrays()
    hi = idx._scan_hi_water()
    if hi < len(arrs["x"]):
        # capacity rounds to pow2: persisting the dead tail doubles the
        # save bytes right after a growth; from_state re-derives
        # capacity from x.shape[0] and the next leg regrows it
        for name in ("x", "valid", "levels", "nb0"):
            arrs[name] = arrs[name][:hi]
    tmp_out = args.out + ".tmp.npz"
    np.savez(tmp_out, **arrs)
    os.replace(tmp_out, args.out)  # a killed save must not corrupt
    rep(stage="saved", out=args.out, size=idx.size,
        save_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
