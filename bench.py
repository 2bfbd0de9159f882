"""Headline benchmark (driver-run on real TPU hardware).

Workload: BASELINE.json config 1/3 shape — 100K x 128 cosine space,
batched nearest_neighbors(k=10) through the engine's TPU fast path
(bf16 score matmul + approx_max_k oversampled candidates + f32 rerank).
Measured recall@10 vs the exact oracle is reported inside the metric
string (the BASELINE bar is >= 0.95; the reference's hnswlib-at-default
ef=10 sits far below our ~0.998).

Note: on this dev setup the chip sits behind a network tunnel
(~27 ms RTT, ~35 MB/s), so the measured number is transfer-dominated;
batch size and int8 query upload amortize what can be amortized.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured speedup over a single-socket CPU
brute-force baseline run in the same process (the reference engine
walks its graph per query on CPU behind a global mutex, SURVEY.md §2c).
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json
import time

import numpy as np

N, D, B, K = 100_000, 128, 4096, 10
METRIC = "cosine"
TIMED_BATCHES = 12
TRIALS = 5  # median-of-N: single-trial headlines swung 45% round-to-
            # round on this tunnel (BENCH_r02 89.7k vs r03 49.4k on an
            # identical code path); report median + min/max band
WARMUP_TRIALS = 2  # discarded before recording: the first trials after
                   # a dispatch-path change carry compile+tunnel-socket
                   # warm-up (BENCH_r04's int8 band [16,475..79,383]
                   # contained one 16.5k cold trial — a 4.8x intra-run
                   # spread that is harness state, not engine variance;
                   # VERDICT r4 weak #3).  Policy: run WARMUP_TRIALS
                   # full trials untimed-for-the-record, then TRIALS
                   # recorded trials; median of recorded is the
                   # headline, min..max of recorded is the band.


def main() -> None:
    from embeddinghub_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((TIMED_BATCHES, B, D)).astype(np.float32)

    # ---- build (pack + device upload) ----
    t0 = time.perf_counter()
    idx = FlatIndex(D, metric=METRIC, capacity=N, chunk_target=32768)
    idx.add(np.arange(N), vecs)
    idx._sync()
    build_s = time.perf_counter() - t0
    idx.search(queries[0], K, with_distances=False, query_dtype="int8")

    # ---- timed TPU batches (indices-only readback, int8 query upload,
    # pipelined dispatch: batch i+1's upload overlaps batch i's
    # compute/readback — the QueryBatcher drains concurrent RPCs the
    # same way).  TRIALS independent trials; median is the headline,
    # min/max is the tunnel-variance band. ----
    def timed_trial(**kw):
        t0 = time.perf_counter()
        handles = [
            idx.search_async(queries[i], K, **kw)
            for i in range(TIMED_BATCHES)
        ]
        _ = [np.asarray(h) for h in handles]
        return TIMED_BATCHES * B / (time.perf_counter() - t0)

    for _ in range(WARMUP_TRIALS):  # discarded (see WARMUP_TRIALS)
        timed_trial(query_dtype="int8")
    int8_trials = sorted(
        timed_trial(query_dtype="int8") for _ in range(TRIALS)
    )
    tpu_qps = float(np.median(int8_trials))

    # ---- companion line: full-precision (f32-wire) queries, same
    # pipelined dispatch.  The int8 headline couples a wire optimization
    # to a small recall cost; report BOTH so the quality/speed trade is
    # visible in the bench output itself (VERDICT r2 weak #5). ----
    idx.search(queries[0], K, with_distances=False)
    for _ in range(WARMUP_TRIALS):  # discarded (see WARMUP_TRIALS)
        timed_trial()
    f32_trials = sorted(timed_trial() for _ in range(TRIALS))
    f32_qps = float(np.median(f32_trials))

    # ---- recall@10 vs exact numpy oracle (both wire modes) ----
    qs = queries[0][:256]
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ xn.T), axis=1)[:, :K]
    got = idx.search(qs, K, with_distances=False, query_dtype="int8")[1]
    recall = np.mean(
        [len(set(got[i]) & set(oracle[i])) / K for i in range(len(qs))]
    )
    got32 = idx.search(qs, K, with_distances=False)[1]
    recall32 = np.mean(
        [len(set(got32[i]) & set(oracle[i])) / K for i in range(len(qs))]
    )

    # ---- CPU baseline: native single-thread HNSW (the reference
    # engine's class of search: hnswlib-style graph walk per query) at
    # an efSearch tuned to ~the same recall bar; falls back to numpy
    # brute force when no toolchain ----
    cpu_qps, base_kind = _cpu_baseline(vecs, queries[1][:256], recall_floor=0.95)

    result = {
        "metric": (
            f"batched kNN QPS/chip (100K x {D} cosine, B={B}, k={K}, "
            f"median of {TRIALS} trials after {WARMUP_TRIALS} discarded "
            f"warm-ups, int8-wire "
            f"[{int8_trials[0]:.0f}..{int8_trials[-1]:.0f}] "
            f"recall@10={recall:.3f}; f32-wire {f32_qps:.0f} q/s "
            f"[{f32_trials[0]:.0f}..{f32_trials[-1]:.0f}] "
            f"recall@10={recall32:.3f}, build={build_s:.1f}s, "
            f"baseline={base_kind}, tunnel-IO-bound)"
        ),
        "value": round(tpu_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }
    print(json.dumps(result))


def _cpu_baseline(vecs, queries, recall_floor: float):
    """QPS of the CPU reference-class engine at >= recall_floor."""
    try:
        from embeddinghub_tpu.native import CpuHnsw

        h = CpuHnsw(vecs.shape[1], m=16, ef_construction=200, metric="cosine")
        h.add(vecs)
        xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        oracle = np.argsort(-(qn @ xn.T), axis=1)[:, :K]
        for ef in (40, 80, 160, 320, 640):
            t0 = time.perf_counter()
            _, ids = h.search(queries, K, ef=ef)
            dt = time.perf_counter() - t0
            rec = np.mean(
                [len(set(ids[i]) & set(oracle[i])) / K for i in range(len(queries))]
            )
            if rec >= recall_floor:
                return len(queries) / dt, f"cpu-hnsw(ef={ef},recall={rec:.3f})"
        return len(queries) / dt, f"cpu-hnsw(ef=640,recall={rec:.3f})"
    except Exception:
        xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        t0 = time.perf_counter()
        sims = qn @ xn.T
        np.argpartition(-sims, K, axis=1)[:, :K]
        return len(queries) / (time.perf_counter() - t0), "cpu-bruteforce"


if __name__ == "__main__":
    main()
