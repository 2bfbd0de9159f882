"""Recall/QPS parity sweep (BASELINE.md configs).

Engines:
  * flat   — exact TPU scan (recall 1.0 reference point)
  * approx — bf16 + approx_max_k + rerank fast path
  * hnsw   — array-form TPU HNSW at (M, efConstruction), efSearch sweep
  * cpu    — native single-thread CPU HNSW (reference-class baseline)

Datasets: ann-benchmarks-style files when present (``--data sift.npz``
with arrays train/test/neighbors), else synthetic gaussian or clustered
data.  Prints one JSON line per (engine, ef) point.

Usage:
  python benchmarks/recall_sweep.py --n 100000 --dims 128 --metric l2 \
      --engines flat,approx,cpu --efs 10,50,100
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


def load_data(args):
    if args.data and os.path.exists(args.data):
        if args.data.endswith((".hdf5", ".h5")):
            # ann-benchmarks files (e.g. sift-128-euclidean.hdf5)
            import h5py

            with h5py.File(args.data, "r") as z:
                train = np.asarray(z["train"], np.float32)
                test = np.asarray(z["test"], np.float32)
                gt = (
                    np.asarray(z["neighbors"])[:, : args.k]
                    if "neighbors" in z
                    else None
                )
            return train, test, gt
        z = np.load(args.data)
        train, test = z["train"].astype(np.float32), z["test"].astype(np.float32)
        gt = z["neighbors"][:, : args.k] if "neighbors" in z else None
        return train, test, gt
    rng = np.random.default_rng(0)
    if getattr(args, "sift_desc", False):
        # SIFT-*descriptor*-statistics proxy (the real SIFT-1M files are
        # not obtainable in this zero-egress image): 4x4 spatial grid x
        # 8 orientation bins, non-negative, heavy-tailed per-cell energy
        # with spatially correlated orientation fields, value clipping
        # and uint8 quantization — matching real descriptors' marginals
        # (sparse, clipped at 0.2*norm, integer-valued) far better than
        # gaussians.  dims must be 128.
        assert args.dims == 128, "sift-desc mode is 128-d"

        def sample_desc(count, rng):
            # dominant orientation per patch region, smoothed over the grid
            base_ori = rng.uniform(0, 8, size=(count, 1, 1))
            drift = rng.normal(0, 1.2, size=(count, 4, 4)).cumsum(2)
            ori = (base_ori + drift) % 8                    # [n,4,4]
            bins = np.arange(8)[None, None, None, :]
            ang = np.minimum(
                np.abs(bins - ori[..., None]),
                8 - np.abs(bins - ori[..., None]),
            )
            resp = np.exp(-(ang ** 2) / (2 * 1.1 ** 2))     # orientation response
            energy = rng.gamma(2.0, 1.0, size=(count, 4, 4, 1))
            noise = rng.gamma(1.0, 0.25, size=(count, 4, 4, 8))
            d = (resp * energy + noise).reshape(count, 128)
            d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
            d = np.minimum(d, 0.2)                          # SIFT clipping
            d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
            return np.floor(512.0 * d).astype(np.float32)   # uint8-style ints

        train = sample_desc(args.n, rng)
        test = sample_desc(args.nq, np.random.default_rng(1))
        return train, test, None
    if getattr(args, "glove_like", False):
        # GloVe-*embedding*-statistics proxy (real glove-100-angular
        # files are not obtainable in this zero-egress image): trained
        # word embeddings are strongly anisotropic — variance
        # concentrates in a few dozen principal directions with a
        # power-law spectrum — and their norms spread log-normally with
        # word frequency.  Sampled as x = (z * s) Q + mu with a
        # power-law spectrum s_i ~ i^-0.55, a shared random rotation Q,
        # a common mean offset (embeddings are famously non-centered),
        # and a lognormal per-row norm factor; queried with the angular
        # metric, exactly ann-benchmarks glove-100-angular's protocol.
        dd = args.dims
        spectrum = (np.arange(1, dd + 1) ** -0.55).astype(np.float32)
        qmat, _ = np.linalg.qr(rng.standard_normal((dd, dd)))
        qmat = qmat.astype(np.float32)
        mu = (0.8 * rng.standard_normal(dd)).astype(np.float32)

        def sample_glove(count, r):
            z = r.standard_normal((count, dd)).astype(np.float32)
            x = (z * spectrum[None, :]) @ qmat + mu[None, :]
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            return x * r.lognormal(1.4, 0.35, count)[:, None].astype(
                np.float32
            )

        train = sample_glove(args.n, rng)
        test = sample_glove(args.nq, np.random.default_rng(1))
        return train.astype(np.float32), test.astype(np.float32), None
    if args.sift_like:
        # SIFT-style structure: hierarchical clusters with varying
        # spread + heavy-tailed magnitudes (local intrinsic dimension
        # far below D, like real descriptor data)
        n_top, n_sub = 32, 8
        top = rng.standard_normal((n_top, args.dims)) * 6
        sub = top[:, None, :] + rng.standard_normal((n_top, n_sub, args.dims)) * 2
        sub = sub.reshape(-1, args.dims)
        spread = rng.uniform(0.3, 1.2, size=len(sub))

        def sample(count):
            a = rng.integers(0, len(sub), size=count)
            pts = sub[a] + rng.standard_normal((count, args.dims)) * spread[a][:, None]
            return pts

        train, test = sample(args.n), sample(args.nq)
    elif args.clustered:
        centers = rng.standard_normal((64, args.dims)) * 4
        assign = rng.integers(0, 64, size=args.n)
        train = centers[assign] + rng.standard_normal((args.n, args.dims))
        test = centers[rng.integers(0, 64, size=args.nq)] + rng.standard_normal(
            (args.nq, args.dims)
        )
    else:
        train = rng.standard_normal((args.n, args.dims))
        test = rng.standard_normal((args.nq, args.dims))
    return train.astype(np.float32), test.astype(np.float32), None


def ground_truth(train, test, k, metric):
    if metric == "l2":
        d = (
            -2 * test @ train.T
            + (train * train).sum(1)[None, :]
            + (test * test).sum(1)[:, None]
        )
    else:
        ta = train / np.linalg.norm(train, axis=1, keepdims=True)
        qa = test / np.linalg.norm(test, axis=1, keepdims=True)
        d = 1 - qa @ ta.T
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def recall(ids, gt, k):
    return float(
        np.mean([len(set(ids[i, :k]) & set(gt[i, :k])) / k for i in range(len(gt))])
    )


def report(**kv):
    print(json.dumps(kv), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--metric", default="l2", choices=["l2", "cosine"])
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--efs", default="10,50,100,200")
    ap.add_argument("--engines", default="flat,approx,cpu")
    ap.add_argument("--data", default=None)
    ap.add_argument("--clustered", action="store_true")
    ap.add_argument("--sift-like", action="store_true", dest="sift_like")
    ap.add_argument("--sift-desc", action="store_true", dest="sift_desc",
                    help="SIFT-descriptor-statistics proxy (128-d uint8-style)")
    ap.add_argument("--glove-like", action="store_true", dest="glove_like",
                    help="GloVe-embedding-statistics proxy (anisotropic "
                         "power-law spectrum, lognormal norms; angular)")
    args = ap.parse_args()

    train, test, gt = load_data(args)
    n, dims = train.shape
    if gt is None:
        gt = ground_truth(train, test, args.k, args.metric)
    engines = args.engines.split(",")
    efs = [int(e) for e in args.efs.split(",")]

    if "flat" in engines or "approx" in engines:
        from embeddinghub_tpu.index.flat import FlatIndex

        t0 = time.perf_counter()
        flat = FlatIndex(dims, metric=args.metric, capacity=n)
        flat.add(np.arange(n), train)
        flat._sync()
        build = time.perf_counter() - t0
        for mode in ("exact", "approx"):
            if ("flat" if mode == "exact" else "approx") not in engines:
                continue
            flat.search(test[:8], args.k, mode=mode)  # warm
            t0 = time.perf_counter()
            _, ids = flat.search(test, args.k, mode=mode)
            dt = time.perf_counter() - t0
            report(
                engine=f"flat-{mode}",
                n=n,
                dims=dims,
                metric=args.metric,
                build_s=round(build, 2),
                recall=round(recall(ids, gt, args.k), 4),
                qps=round(len(test) / dt, 1),
            )

    if "hnsw" in engines:
        from embeddinghub_tpu.index.hnsw import HNSWIndex

        t0 = time.perf_counter()
        idx = HNSWIndex(dims, metric=args.metric, m=args.m, ef_construction=args.efc)
        idx.add(np.arange(n), train)
        build = time.perf_counter() - t0
        for ef in efs:
            idx.search(test[:8], args.k, ef=ef)  # warm/compile
            t0 = time.perf_counter()
            _, ids = idx.search(test, args.k, ef=ef)
            dt = time.perf_counter() - t0
            report(
                engine="hnsw-tpu",
                n=n,
                dims=dims,
                m=args.m,
                efc=args.efc,
                ef=ef,
                build_s=round(build, 2),
                recall=round(recall(ids, gt, args.k), 4),
                qps=round(len(test) / dt, 1),
            )

    if "cpu" in engines:
        from embeddinghub_tpu.native import CpuHnsw, load

        if load() is None:
            report(engine="cpu-hnsw", error="native toolchain unavailable")
        else:
            t0 = time.perf_counter()
            h = CpuHnsw(dims, m=args.m, ef_construction=args.efc, metric=args.metric)
            h.add(train)
            build = time.perf_counter() - t0
            for ef in efs:
                t0 = time.perf_counter()
                _, ids = h.search(test, args.k, ef=ef)
                dt = time.perf_counter() - t0
                report(
                    engine="cpu-hnsw",
                    n=n,
                    dims=dims,
                    m=args.m,
                    efc=args.efc,
                    ef=ef,
                    build_s=round(build, 2),
                    recall=round(recall(ids, gt, args.k), 4),
                    qps=round(len(test) / dt, 1),
                )


if __name__ == "__main__":
    main()
