"""Crash durability: SIGKILL the server mid-write-stream; a restarted
server on the same data dir must recover every acknowledged write from
the WAL (possibly plus a benign suffix of unacknowledged ones) and stay
fully functional."""

import os
import random
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(port, data_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/ehtpu_jax_cache"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "embeddinghub_tpu.service.server",
            f"0.0.0.0:{port}", data_dir,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        line = proc.stdout.readline().decode()
        if "listening" in line:
            # Drain the pipe forever (XLA logs can fill a 64 KB pipe and
            # block the server's writes, deadlocking the test).
            import threading

            threading.Thread(
                target=lambda: [
                    None for _ in iter(proc.stdout.readline, b"")
                ],
                daemon=True,
            ).start()
            return proc
        if proc.poll() is not None:
            raise RuntimeError(proc.stdout.read().decode())
    proc.kill()
    raise RuntimeError("server start timeout")


def test_sigkill_mid_stream_recovers_acknowledged_writes(tmp_path):
    from embeddinghub_tpu.sdk.client import EmbeddingHubClient

    port = random.randint(20000, 40000)
    data_dir = str(tmp_path / "store")
    proc = _spawn(port, data_dir)
    try:
        c = EmbeddingHubClient(port=port)
        c.create_space("dur", 8)
        rng = np.random.default_rng(0)
        # acknowledged batch (multiset returns after server applied it)
        acked = {f"a{i}": rng.standard_normal(8).tolist() for i in range(500)}
        c.multiset("dur", acked)

        # fire-and-forget singles, then SIGKILL mid-air
        futures = [
            c.set("dur", f"b{i}", rng.standard_normal(8).tolist(), wait=False)
            for i in range(200)
        ]
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()
        for f in futures:
            try:
                f.result()
            except Exception:
                pass
        c.close()
    finally:
        if proc.poll() is None:
            proc.kill()

    # restart on the same dir: every acknowledged write must be there
    proc2 = _spawn(port, data_dir)
    try:
        c2 = EmbeddingHubClient(port=port)
        recovered = dict(c2.download("dur"))
        for key, vec in acked.items():
            assert key in recovered, f"lost acknowledged key {key}"
            np.testing.assert_allclose(list(recovered[key]), vec, rtol=1e-6)
        # store remains fully functional after recovery
        c2.set("dur", "post", [1.0] * 8)
        got = c2.nearest_neighbor("dur", 1, embedding=[1.0] * 8)
        assert list(got) == ["post"]
        c2.close()
    finally:
        proc2.kill()
        proc2.wait()
