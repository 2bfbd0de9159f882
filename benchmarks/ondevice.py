"""On-device perf truth: chip-side latency / bandwidth / MFU, separated
from the dev tunnel's wire time (VERDICT r1 item 6).

Method: repeated-dispatch amortization — K async dispatches queued, one
block at the end; per-dispatch device time = wall / K (dispatch cost and
the single readback amortize away).  Peaks used for utilization are the
v5e (TPU v5 lite) datasheet numbers: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage:
  python benchmarks/ondevice.py --n 1000000 --dims 128 --batch 1024
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.0  # v5e f32 (no native f32 MXU; via passes)
PEAK_HBM_GBS = 819.0


def amortized_s(fn, args, reps=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from embeddinghub_tpu.ops.pallas_topk import fused_topk_search
    from embeddinghub_tpu.ops.topk import chunked_topk_search

    chunk = 62500 if args.n % 62500 == 0 else 65536
    n = -(-args.n // chunk) * chunk
    d, b, k = args.dims, args.batch, args.k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    valid = jnp.ones((n,), bool)
    x_sq = jnp.einsum("nd,nd->n", x, x)
    backend = jax.default_backend()

    def rep(**kv):
        print(json.dumps(kv), flush=True)

    scan_bytes = n * d * 4  # the arena stream; q/outputs negligible
    flops = 2.0 * n * d * b

    # --- XLA chunked exact search ---
    f = jax.jit(
        functools.partial(chunked_topk_search, metric="l2", k=k, chunk=chunk)
    )
    dt = amortized_s(f, (q, x, valid, x_sq), args.reps)
    rep(
        kernel="chunked_topk_search(XLA)", backend=backend, n=n, dims=d,
        batch=b, k=k,
        device_ms=round(dt * 1e3, 3),
        qps_on_device=round(b / dt, 1),
        hbm_util=round(scan_bytes / dt / 1e9 / PEAK_HBM_GBS, 3),
        mfu_bf16=round(flops / dt / 1e12 / PEAK_BF16_TFLOPS, 3),
    )

    # --- Pallas fused kernel (real Mosaic lowering) ---
    try:
        fp = functools.partial(
            fused_topk_search, k=k, metric="l2", interpret=False
        )
        dt = amortized_s(fp, (q, x, valid, x_sq), args.reps)
        rep(
            kernel="fused_topk_search(pallas)", backend=backend, n=n,
            dims=d, batch=b, k=k,
            device_ms=round(dt * 1e3, 3),
            qps_on_device=round(b / dt, 1),
            hbm_util=round(scan_bytes / dt / 1e9 / PEAK_HBM_GBS, 3),
            mfu_bf16=round(flops / dt / 1e12 / PEAK_BF16_TFLOPS, 3),
        )
    except Exception as e:  # noqa: BLE001 — pallas may not lower on CPU
        rep(kernel="fused_topk_search(pallas)", backend=backend,
            error=str(e)[:200])

    # --- bf16 variant of the exact scan (MXU-native operand width) ---
    xb = x.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)

    def bf16_scan(qb, xb, valid, x_sq):
        dots = jax.lax.dot_general(
            qb, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dist = x_sq[None, :] - 2.0 * dots
        dist = jnp.where(valid[None, :], dist, jnp.inf)
        dd, ii = jax.lax.top_k(-dist, k)
        return -dd, ii

    fb = jax.jit(bf16_scan)
    dt = amortized_s(fb, (qb, xb, valid, x_sq), args.reps)
    rep(
        kernel="bf16_full_scan(XLA)", backend=backend, n=n, dims=d,
        batch=b, k=k,
        device_ms=round(dt * 1e3, 3),
        qps_on_device=round(b / dt, 1),
        hbm_util=round(scan_bytes / 2 / dt / 1e9 / PEAK_HBM_GBS, 3),
        mfu_bf16=round(flops / dt / 1e12 / PEAK_BF16_TFLOPS, 3),
    )


if __name__ == "__main__":
    main()
