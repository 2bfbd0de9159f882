"""Embeddinghub benchmark suite.

Parity harness with reference ``embeddinghub/test/benchmark.py``: spawn
the real server on a random port, run timed suites through the SDK —
CreateSpace / FreezeSpace, narrow+sparse set/get, batched multiset /
multiget (batch 3/100/1000), and the ANN suite (10k inserts of 50-d
vectors, 10k keyed nearest-neighbor queries, k=20) — single-threaded
and with a 10-worker thread pool.  Prints one JSON line per suite.

Usage:  python benchmarks/benchmark_suite.py [--ops 10000] [--ann-n 10000]
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import json
import os
import random
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def spawn_server(port: int, data_dir: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "embeddinghub_tpu.service.server",
            f"0.0.0.0:{port}",
            data_dir,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline().decode()
        if "listening" in line:
            return proc
        if proc.poll() is not None:
            raise RuntimeError(proc.stdout.read().decode())
    raise RuntimeError("server start timeout")


def timed(name: str, n_ops: int, fn) -> dict:
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    rec = {
        "suite": name,
        "seconds": round(dt, 3),
        "ops": n_ops,
        "ops_per_sec": round(n_ops / dt, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", type=int, default=10000)
    ap.add_argument("--ann-n", type=int, default=10000)
    ap.add_argument("--ann-dims", type=int, default=50)
    ap.add_argument("--threads", type=int, default=10)
    args = ap.parse_args()

    from embeddinghub_tpu.sdk.client import EmbeddingHubClient

    port = random.randint(20000, 40000)
    import tempfile

    with tempfile.TemporaryDirectory() as data_dir:
        proc = spawn_server(port, data_dir)
        try:
            client = EmbeddingHubClient(port=port)
            rng = np.random.default_rng(0)

            # --- space lifecycle ---
            timed(
                "create_space x100",
                100,
                lambda: [client.create_space(f"cs{i}", 8) for i in range(100)],
            )
            timed(
                "freeze_space x100",
                100,
                lambda: [client.freeze_space(f"cs{i}") for i in range(100)],
            )

            # --- point ops ---
            client.create_space("narrow", 8)
            emb8 = [float(x) for x in rng.standard_normal(8)]
            timed(
                f"narrow_set x{args.ops}",
                args.ops,
                lambda: [
                    client.set("narrow", f"k{i % 5}", emb8)
                    for i in range(args.ops)
                ],
            )
            timed(
                f"narrow_get x{args.ops}",
                args.ops,
                lambda: [
                    client.get("narrow", f"k{i % 5}") for i in range(args.ops)
                ],
            )
            client.create_space("sparse", 8)
            timed(
                f"sparse_set x{args.ops}",
                args.ops,
                lambda: [
                    client.set("sparse", f"k{i % 5000}", emb8)
                    for i in range(args.ops)
                ],
            )

            # --- batched ops ---
            for batch in (3, 100, 1000):
                client.create_space(f"batch{batch}", 8)
                items = {
                    f"k{i}": [float(x) for x in rng.standard_normal(8)]
                    for i in range(batch)
                }
                reps = max(1, 3000 // batch)
                timed(
                    f"multiset batch={batch} x{reps}",
                    reps * batch,
                    lambda: [
                        client.multiset(f"batch{batch}", items)
                        for _ in range(reps)
                    ],
                )
                timed(
                    f"multiget batch={batch} x{reps}",
                    reps * batch,
                    lambda: [
                        list(client.multiget(f"batch{batch}", items.keys()))
                        for _ in range(reps)
                    ],
                )

            # --- ANN suite (benchmark.py:217-250 shape) ---
            n, d = args.ann_n, args.ann_dims
            vecs = rng.standard_normal((n, d)).astype(np.float32)
            client.create_space("ann", d)
            timed(
                f"ann_insert n={n}",
                n,
                lambda: client.multiset(
                    "ann", ((f"w{i}", vecs[i].tolist()) for i in range(n))
                ),
            )
            keys = [f"w{i}" for i in rng.integers(0, n, size=n)]
            timed(
                f"ann_keyed_nn n={n} k=20",
                n,
                lambda: [
                    client.nearest_neighbor("ann", 20, key=key) for key in keys
                ],
            )

            # --- multithreaded variants ---
            def mt(fn, items):
                with ThreadPoolExecutor(args.threads) as ex:
                    list(ex.map(fn, items))

            timed(
                f"narrow_get mt{args.threads} x{args.ops}",
                args.ops,
                lambda: mt(
                    lambda i: client.get("narrow", f"k{i % 5}"),
                    range(args.ops),
                ),
            )
            timed(
                f"ann_keyed_nn mt{args.threads} n={n} k=20",
                n,
                lambda: mt(
                    lambda key: client.nearest_neighbor("ann", 20, key=key),
                    keys,
                ),
            )
        finally:
            proc.kill()
            proc.wait()


if __name__ == "__main__":
    main()
