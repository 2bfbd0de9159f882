"""CI-scale version of the chained soak (benchmarks/soak_chain.py,
VERDICT r4 item 3): seed a graph-backed store, run a concurrent
segment, CRASH mid-write (os._exit in a subprocess), and prove the
next segment recovers every acked write via snapshot + WAL replay.

The at-scale runs (1M cluster-built base, multi-segment chain on the
real chip) are recorded in benchmarks/RESULTS.md; this test pins the
MECHANISM — segment chaining, kill drill, recovery check, base-recall
filtering — on the CPU mesh at toy scale.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from embeddinghub_tpu.index.hnsw import HNSWIndex

    root = tmp_path_factory.mktemp("soakchain")
    rng = np.random.default_rng(0)
    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(d, metric="l2", m=8, ef_construction=60,
                    capacity=n + 50000)
    idx.add(np.arange(n), x)
    graph = str(root / "graph.npz")
    np.savez(graph, **idx.state_arrays())
    test = x[:32] + 0.01 * rng.standard_normal((32, d)).astype(np.float32)
    full = ((test[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]
    gtf = str(root / "gt.npz")
    np.savez(gtf, test=test, gt=gt)
    return str(root / "store"), graph, gtf


def _run(store, graph, gtf, seconds, kill=False):
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    cmd = [
        sys.executable, os.path.join(REPO, "benchmarks", "soak_chain.py"),
        "--dir", store, "--graph", graph, "--gt", gtf,
        "--dims", "16", "--seconds", str(seconds),
        "--snapshot-every", "5",
    ]
    if kill:
        cmd.append("--kill")
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=570
    )
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    return out.returncode, lines


def test_chain_with_mid_write_crash(assets):
    store, graph, gtf = assets

    # segment 1: seeds + clean close
    rc, lines = _run(store, graph, gtf, seconds=8)
    assert rc == 0, lines
    done = [l for l in lines if l.get("stage") == "segment_done"][0]
    assert done["errors"] == [] and done["size_end"] >= done["size_start"]

    # segment 2: dies mid-write (os._exit(137))
    rc, lines = _run(store, graph, gtf, seconds=10, kill=True)
    assert rc == 137, (rc, lines)
    assert any(l.get("stage") == "killing" for l in lines)

    # segment 3: must recover every acked write from snapshot + WAL
    rc, lines = _run(store, graph, gtf, seconds=8)
    assert rc == 0, lines
    rec = [l for l in lines if l.get("stage") == "recovery_check"][0]
    assert rec["after_kill"] is True
    assert rec["probe_missing"] == 0
    assert rec["found_rows"] >= rec["expected_rows"]
    done = [l for l in lines if l.get("stage") == "segment_done"][0]
    assert done["errors"] == []
    assert done["recall_ef100"] >= 0.85  # base neighbors stay reachable

    log = os.path.join(store, "soak_log.jsonl")
    assert sum(1 for _ in open(log)) == 2  # kill segment logs no line
