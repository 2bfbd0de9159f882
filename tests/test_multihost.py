"""Multi-host sharded search dry run: 2 jax.distributed processes with
4 virtual devices each; the all-gather top-k merge crosses the process
boundary (the DCN path's mechanics, BASELINE config 5)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "multihost_dryrun.py")


@pytest.mark.slow
def test_two_process_sharded_search():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/ehtpu_jax_cache"
    proc = subprocess.run(
        [
            sys.executable, SCRIPT,
            "--procs", "2", "--local-devices", "4", "--port", "29731",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PASS multihost 2x4" in proc.stdout
