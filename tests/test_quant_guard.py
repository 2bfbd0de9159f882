"""Quantization-regime guard (index/flat.apply_quant_guard).

The Deep-10M capacity run (benchmarks/RESULTS.md) showed that on dense
near-duplicate clusters raw int8 storage silently collapses to recall
0.44: within-cluster score gaps sit below int8 quantization noise, so
phase-1 candidate ordering scrambles and the dequantized rerank cannot
recover it.  The guard detects that regime from a host-side sample at
full-sync time and escalates int8 -> int8x2 -> bfloat16 (f32 on the
sharded arena) with a logged notice, instead of leaving "pick int8 for
separable data" as documentation where a runtime check should be.
"""

import logging

import numpy as np
import pytest

from embeddinghub_tpu.index.flat import FlatIndex, _simulate_quant_recall
from embeddinghub_tpu.parallel.sharded_flat import ShardedFlatIndex


def clustered(n=8192, d=32, centers=8, spread=2e-2, seed=0):
    """Near-duplicate clusters: center norm ~1, within-cluster offsets
    ~spread — true neighbor score gaps far below int8 resolution
    (max|x|/127 per element) but above int8x2's residual resolution."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = c[np.arange(n) % centers] + spread * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return x.astype(np.float32)


def separable(n=8192, d=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def exact_oracle(x, q, k, metric="l2"):
    if metric == "cosine":
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        s = qn @ xn.T
    else:
        s = 2.0 * (q @ x.T) - np.einsum("nd,nd->n", x, x)[None, :]
    return np.argsort(-s, axis=1)[:, :k]


def recall(pred, true):
    hits = sum(
        np.intersect1d(p, t).size for p, t in zip(pred, true)
    )
    return hits / true.size


def test_simulator_separates_regimes():
    x = clustered()
    x_sq = np.einsum("nd,nd->n", x, x, dtype=np.float32)
    assert _simulate_quant_recall(x, x_sq, "l2", "int8") < 0.8
    assert _simulate_quant_recall(x, x_sq, "l2", "int8x2") >= 0.95
    y = separable()
    y_sq = np.einsum("nd,nd->n", y, y, dtype=np.float32)
    assert _simulate_quant_recall(y, y_sq, "l2", "int8") >= 0.95


def test_flat_int8_escalates_on_clustered_data(caplog):
    x = clustered()
    idx = FlatIndex(x.shape[1], metric="l2", storage_dtype="int8")
    idx.add(np.arange(x.shape[0]), x)
    q = x[:64] + 1e-5
    with caplog.at_level(logging.WARNING, logger="embeddinghub_tpu.index"):
        _, ids = idx.search(q, k=10)
    assert idx.storage_dtype == "int8x2"
    assert any("escalating storage" in r.message for r in caplog.records)
    true = exact_oracle(x, q, 10)
    assert recall(ids, true) >= 0.95


def test_flat_int8_stays_on_separable_data():
    x = separable()
    idx = FlatIndex(x.shape[1], metric="l2", storage_dtype="int8")
    idx.add(np.arange(x.shape[0]), x)
    idx.search(x[:8], k=10)
    assert idx.storage_dtype == "int8"


def test_guard_can_be_disabled():
    x = clustered()
    idx = FlatIndex(
        x.shape[1], metric="l2", storage_dtype="int8", quant_guard=False
    )
    idx.add(np.arange(x.shape[0]), x)
    idx.search(x[:8], k=10)
    assert idx.storage_dtype == "int8"


def test_escalated_dtype_survives_snapshot():
    x = clustered()
    idx = FlatIndex(x.shape[1], metric="l2", storage_dtype="int8")
    idx.add(np.arange(x.shape[0]), x)
    idx.search(x[:8], k=10)
    assert idx.storage_dtype == "int8x2"
    state = idx.state_arrays()
    idx2 = FlatIndex.from_state(x.shape[1], "l2", dict(state))
    assert idx2.storage_dtype == "int8x2"


def test_sharded_int8_escalates(caplog):
    x = clustered(n=8192)
    idx = ShardedFlatIndex(x.shape[1], metric="l2", storage_dtype="int8")
    idx.add(np.arange(x.shape[0]), x)
    q = x[:32] + 1e-5
    with caplog.at_level(logging.WARNING, logger="embeddinghub_tpu.index"):
        _, ids = idx.search(q, k=10)
    assert idx.storage_dtype == "int8x2"
    true = exact_oracle(x, q, 10)
    assert recall(ids, true) >= 0.95


def test_guard_skips_below_min_rows():
    x = clustered(n=1024)
    idx = FlatIndex(x.shape[1], metric="l2", storage_dtype="int8")
    idx.add(np.arange(x.shape[0]), x)
    idx.search(x[:8], k=10)
    assert idx.storage_dtype == "int8"  # too small to judge — untouched


def test_cosine_metric_guard():
    x = clustered()
    idx = FlatIndex(x.shape[1], metric="cosine", storage_dtype="int8")
    idx.add(np.arange(x.shape[0]), x)
    q = x[:32]
    _, ids = idx.search(q, k=10)
    assert idx.storage_dtype in ("int8x2", "bfloat16")
    true = exact_oracle(x, q, 10, metric="cosine")
    assert recall(ids, true) >= 0.95
