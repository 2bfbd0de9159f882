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


# --------------------------------------------------------------------------
# Post-ingest measured audit (FlatIndex.audit_recall / audit_and_escalate)
#
# The sample-simulating guard is blind to the POOL-CONTAINMENT regime:
# phase-1 ranks by the int8 hi plane only, and when per-row scales are
# inflated (one large-magnitude dim) the hi ordering scrambles and the
# true top-k fall out of the k*oversample candidate pool.  The 50M-row
# r4 capacity run served recall 0.794 from an arena whose 16k sample
# simulated >0.99 (benchmarks/artifacts/r4_cap50m_b256.log).  The audit
# measures the live device path against an exact host oracle instead.
# --------------------------------------------------------------------------


def outlier_scaled(n=4096, d=32, gap=5e-2, outlier=50.0, seed=3):
    """Rows ~ u + small distinct offsets (true l2 gaps ~gap) plus ONE
    constant-magnitude random-sign outlier dim.  The outlier sets every
    row's int8 scale to ~outlier/127, so hi-plane dot noise (~0.2)
    swamps the true gaps and phase-1 containment collapses, while
    x_sq stays exact (constant offset) and cannot rescue the ordering."""
    rng = np.random.default_rng(seed)
    u = rng.standard_normal(d).astype(np.float32)
    u /= np.linalg.norm(u)
    x = u[None, :] + gap * rng.standard_normal((n, d)).astype(np.float32)
    x[:, -1] = outlier * rng.choice([-1.0, 1.0], n)
    return x.astype(np.float32)


def test_audit_detects_containment_failure_and_escalates():
    x = outlier_scaled()
    n, d = x.shape
    idx = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                    capacity=n, quant_guard=False)
    idx.add(np.arange(n), x)
    low = idx.audit_recall(nq=32, k=10)
    assert low < 0.6, low  # the regime the sample guard cannot see
    report = idx.audit_and_escalate(bar=0.95, nq=32, k=10)
    assert report["escalated"], report
    assert idx.storage_dtype in ("bfloat16", "float32")
    assert report["audited"][-1]["recall"] >= 0.9, report
    # audited recalls are monotone non-decreasing along the ladder
    recs = [a["recall"] for a in report["audited"]]
    assert recs == sorted(recs), recs
    # escalated arena still serves scatter inserts coherently (the probe
    # must differ by >> f32 score rounding at |x|^2 ~ outlier^2 = 2500)
    nv = x[0].copy()
    nv[:8] = -nv[:8]
    idx.add([n - 1], nv[None, :])
    _, i = idx.search(nv[None, :], 1)
    assert i[0, 0] == n - 1


def test_audit_passes_clean_data_without_escalation():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2048, 24)).astype(np.float32)
    idx = FlatIndex(dims=24, metric="cosine", storage_dtype="int8",
                    capacity=2048, quant_guard=False)
    idx.add(np.arange(2048), x)
    report = idx.audit_and_escalate(bar=0.95, nq=32, k=10)
    assert not report["escalated"], report
    assert idx.storage_dtype == "int8"
    assert report["audited"][0]["recall"] >= 0.95


def test_int8_scatter_path_keeps_scales_coherent():
    """Regression for the r4 50M stream OOM fix: the int8/int8x2 dirty
    scatter now updates hi/lo/scales/sq/valid in ONE donated jit call;
    rows whose scale changes on update must still rank correctly."""
    rng = np.random.default_rng(5)
    n, d = 512, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    for dtype in ("int8", "int8x2"):
        idx = FlatIndex(dims=d, metric="cosine", storage_dtype=dtype,
                        capacity=n + 8, quant_guard=False)
        idx.add(np.arange(n), x)
        idx.search(x[:1], 1)  # force the full sync
        # update an existing row to a very different scale + add a new one
        big = (10.0 * x[3] + 5.0).astype(np.float32)
        idx.add([3], big[None, :])
        nv = rng.standard_normal(d).astype(np.float32)
        idx.add([n], nv[None, :])
        _, i3 = idx.search((big / np.linalg.norm(big))[None, :], 1)
        assert i3[0, 0] == 3
        _, inew = idx.search(nv[None, :], 1)
        assert inew[0, 0] == n
        # delete through the scatter path
        idx.remove([3])
        _, gone = idx.search((big / np.linalg.norm(big))[None, :], 1)
        assert gone[0, 0] != 3


# --------------------------------------------------------------------------
# Deep-path behavior (cap > _DEEP_CAP_THRESHOLD), shrunk onto the CPU mesh
# by monkeypatching the thresholds: staged arena upload, deep bf16 routing
# through quantized_chunked_exact, and the audit's boost-before-dtype ladder.
# --------------------------------------------------------------------------


def _shrink_deep(monkeypatch, thresh=1024, block=512, stage=256):
    from embeddinghub_tpu.index import flat

    monkeypatch.setattr(flat, "_DEEP_CAP_THRESHOLD", thresh)
    monkeypatch.setattr(flat, "_DEEP_CAP_BLOCK", block)
    monkeypatch.setattr(flat, "_STAGE_BLOCK_ROWS", stage)


def test_deep_staged_upload_and_chunked_search(monkeypatch):
    """Deep arenas build their device mirror by staged block writes
    (flat._staged_put — the 100M relayout-OOM fix); the search result
    must be identical to what a whole-arena upload would serve."""
    _shrink_deep(monkeypatch)
    rng = np.random.default_rng(7)
    n, d = 3000, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                    capacity=n, quant_guard=False)
    idx.add(np.arange(n), x)
    assert idx.capacity % 512 == 0 and idx.capacity > 1024
    q = x[:16]
    _, ids = idx.search(q, k=10)
    true = exact_oracle(x, q, 10)
    assert recall(np.asarray(ids), true) >= 0.95
    assert ids[0, 0] == 0
    # streaming scatter after a staged build stays coherent
    nv = rng.standard_normal(d).astype(np.float32)
    idx.add([n], nv[None, :])
    _, inew = idx.search(nv[None, :], 1)
    assert inew[0, 0] == n


def test_deep_bf16_routes_through_chunked_scan(monkeypatch):
    """Deep bfloat16 arenas must route through quantized_chunked_exact
    (scales/lo = None): every other bf16 path consumes the whole arena
    in one op, which at real deep scale OOMs the [B, cap] score matrix
    or re-materializes the arena relayout copy."""
    _shrink_deep(monkeypatch)
    rng = np.random.default_rng(9)
    n, d = 3000, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(dims=d, metric="cosine", storage_dtype="bfloat16",
                    capacity=n, quant_guard=False)
    idx.add(np.arange(n), x)
    q = x[:16]
    _, ids = idx.search(q, k=10)
    true = exact_oracle(x, q, 10, metric="cosine")
    assert recall(np.asarray(ids), true) >= 0.97
    # async path takes the same route
    ids2 = np.asarray(idx.search_async(q, 10))
    assert recall(ids2, true) >= 0.97


def test_deep_audit_widens_pool_before_dtype(monkeypatch):
    """On DEEP quantized arenas the audit's first lever is the HBM-free
    phase-1 pool boost (the 50M pool-containment fix), not a dtype
    escalation; dtype only escalates once the boost ladder is spent."""
    _shrink_deep(monkeypatch, thresh=1024, block=2048, stage=1024)
    n, d = 30720, 32
    x = outlier_scaled(n=n, d=d)
    idx = FlatIndex(dims=d, metric="l2", storage_dtype="int8x2",
                    capacity=n, quant_guard=False)
    idx.add(np.arange(n), x)
    report = idx.audit_and_escalate(bar=0.95, nq=24, k=10)
    assert report["audited"][-1]["recall"] >= 0.9, report
    assert len(report["audited"]) > 1, report  # containment did fail
    assert report["boosted"], report
    # the first repair rung is a pool widening at the SAME dtype
    assert report["audited"][0]["boost"] == 1
    assert report["audited"][1]["storage"] == "int8x2"
    assert report["audited"][1]["boost"] == 2
    # any dtype escalation happened only after the boost ladder capped
    if report["escalated"]:
        for a in report["audited"]:
            if a["storage"] != "int8x2":
                break
            last_same = a
        assert last_same["boost"] == FlatIndex._MAX_POOL_BOOST
