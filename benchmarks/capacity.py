"""Deep-scale single-chip capacity demo (BASELINE configs 4-5).

End-to-end on ONE chip with int8 quantized storage: bulk build +
quantized upload, batched queries (QPS + recall@10 vs an exact f32
host oracle), streaming inserts into the live index, snapshot to disk
and restore.  This is the measured counterpart of the reference's
scaling story (chunked materialization, provider/offline.go:589-608) —
here the "chunks" are HBM-resident quantized row tiles on the device.

Usage:
  python benchmarks/capacity.py --n 10000000 --dims 96            # Deep-10M
  python benchmarks/capacity.py --n 100000000 --dims 96 --queries 64 \
      --no-snapshot                                               # Deep-100M
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from embeddinghub_tpu.index.flat import FlatIndex  # noqa: E402

CENTERS = 1024


def rep(**kv):
    print(json.dumps(kv), flush=True)


NOISE = 0.35


def gen_chunk(rng, centers, start, count, dims):
    """Clustered rows (Deep-style data has strong cluster structure).
    ``NOISE`` (--noise) sets the intra-cluster spread: 0.35 is the
    adversarial near-duplicate regime (~10k rows per cluster whose
    score gaps sit below int8 noise — int8 recall 0.44 at 10M, the
    case the quant guard escalates); ~1.0 is the separable regime
    where int8's 1-byte scan is the right trade."""
    assign = rng.integers(0, CENTERS, count)
    out = centers[assign] + NOISE * rng.standard_normal(
        (count, dims)
    ).astype(np.float32)
    return out.astype(np.float32)


def host_oracle(hx, valid_n, q, k, metric="cosine", block=2_000_000):
    """Exact top-k on the host (numpy, chunked) — the recall referee."""
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    best_d = np.full((len(q), k), -np.inf, np.float32)
    best_i = np.full((len(q), k), -1, np.int64)
    for s in range(0, valid_n, block):
        e = min(valid_n, s + block)
        blk = hx[s:e]
        nrm = np.linalg.norm(blk, axis=1, keepdims=True)
        sims = qn @ (blk / np.maximum(nrm, 1e-30)).T  # [Q, block]
        top = np.argpartition(-sims, min(k, e - s - 1), axis=1)[:, :k]
        tv = np.take_along_axis(sims, top, axis=1)
        allv = np.concatenate([best_d, tv], axis=1)
        alli = np.concatenate([best_i, top + s], axis=1)
        sel = np.argsort(-allv, axis=1)[:, :k]
        best_d = np.take_along_axis(allv, sel, axis=1)
        best_i = np.take_along_axis(alli, sel, axis=1)
    return best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--dims", type=int, default=96)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--stream", type=int, default=100_000)
    ap.add_argument("--qbatches", type=int, default=8)
    ap.add_argument("--no-snapshot", action="store_true")
    ap.add_argument("--storage", default="int8",
                    choices=["int8", "int8x2", "bfloat16"],
                    help="device arena dtype (int8x2: hi+lo residual, "
                         "2 bytes/elem, near-exact rerank)")
    ap.add_argument("--noise", type=float, default=NOISE,
                    help="intra-cluster spread (see gen_chunk)")
    ap.add_argument("--audit", action="store_true",
                    help="after the recall referee, run the measured "
                         "post-ingest quant audit (FlatIndex."
                         "audit_and_escalate): escalate the arena dtype "
                         "until device recall clears 0.95 or HBM blocks "
                         "the wider dtype — the at-scale answer to the "
                         "pool-containment regime the sample guard "
                         "cannot see (r4_cap50m_b256.log: 0.794 served "
                         "from an arena whose sample simulated >0.99)")
    args = ap.parse_args()
    globals()["NOISE"] = args.noise

    import jax

    n, d = args.n, args.dims
    rng = np.random.default_rng(0)
    centers = (3.0 * rng.standard_normal((CENTERS, d))).astype(np.float32)

    bpe = {"int8": 1, "int8x2": 2, "bfloat16": 2}[args.storage]
    idx = FlatIndex(
        d, metric="cosine", capacity=n + args.stream, storage_dtype=args.storage
    )
    rep(stage="init", backend=jax.default_backend(), n=n, dims=d,
        capacity=idx.capacity,
        device_hbm_gb=round(idx.capacity * (d * bpe + 9) / 1e9, 2))

    # ---- bulk ingest (host arena) ----
    t0 = time.perf_counter()
    step = 2_000_000
    for s in range(0, n, step):
        c = min(step, n - s)
        idx.add(np.arange(s, s + c), gen_chunk(rng, centers, s, c, d))
    t_ingest = time.perf_counter() - t0
    rep(stage="host_ingest", rows=n, seconds=round(t_ingest, 1),
        rows_per_s=round(n / t_ingest))

    # ---- quantize + upload (host-side int8, ships 1 byte/elem) ----
    t0 = time.perf_counter()
    idx._sync()
    jax.block_until_ready(idx._dx)
    t_up = time.perf_counter() - t0
    rep(stage="quantize_upload", seconds=round(t_up, 1),
        wire_mb=round(idx.capacity * (d * bpe + 9) / 1e6),
        mb_per_s=round(idx.capacity * (d * bpe + 9) / 1e6 / t_up, 1))
    # the quant guard (index/flat.apply_quant_guard) may have escalated
    # the arena dtype during _sync — record the decision (VERDICT r2
    # item 3's done bar: escalation visible in the run artifact)
    rep(stage="storage", requested=args.storage,
        effective=idx.storage_dtype,
        quant_guard_escalated=idx.storage_dtype != args.storage)

    # ---- query throughput (wire-inclusive) ----
    qv = gen_chunk(rng, centers, 0, args.batch, d)
    dd, ii = idx.search(qv, args.k, with_distances=False,
                        query_dtype="bfloat16")  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.qbatches):
        _, ii = idx.search(qv, args.k, with_distances=False,
                           query_dtype="bfloat16")
    t_q = time.perf_counter() - t0
    rep(stage="query", batch=args.batch, batches=args.qbatches,
        qps=round(args.batch * args.qbatches / t_q, 1),
        ms_per_batch=round(t_q / args.qbatches * 1e3, 1))

    # ---- recall vs exact f32 host oracle ----
    nq = args.queries
    qr = gen_chunk(rng, centers, 0, nq, d)
    _, got = idx.search(
        np.concatenate([qr, np.zeros((max(0, args.batch - nq), d),
                                     np.float32)]), args.k)
    got = np.asarray(got)[:nq]
    t0 = time.perf_counter()
    oracle = host_oracle(idx._hx, n, qr, args.k)
    t_or = time.perf_counter() - t0
    recall = float(np.mean([
        len(set(got[i].tolist()) & set(oracle[i].tolist())) / args.k
        for i in range(nq)
    ]))
    rep(stage="recall", queries=nq, k=args.k, recall_at_k=round(recall, 4),
        oracle_seconds=round(t_or, 1))

    # ---- measured post-ingest quant audit (opt-in) ----
    if args.audit:
        t0 = time.perf_counter()
        report = idx.audit_and_escalate(bar=0.95, nq=min(nq, 64), k=args.k)
        rep(stage="quant_audit", seconds=round(time.perf_counter() - t0, 1),
            **report)
        if report["escalated"]:
            # re-measure what the escalated arena actually serves
            t0 = time.perf_counter()
            for _ in range(args.qbatches):
                _, ii = idx.search(qv, args.k, with_distances=False,
                                   query_dtype="bfloat16")
            t_q = time.perf_counter() - t0
            _, got = idx.search(
                np.concatenate([qr, np.zeros((max(0, args.batch - nq), d),
                                             np.float32)]), args.k)
            got = np.asarray(got)[:nq]
            recall = float(np.mean([
                len(set(got[i].tolist()) & set(oracle[i].tolist())) / args.k
                for i in range(nq)
            ]))
            rep(stage="post_audit", storage=idx.storage_dtype,
                qps=round(args.batch * args.qbatches / t_q, 1),
                recall_at_k=round(recall, 4))

    # ---- streaming inserts into the live quantized index ----
    wave = 8192
    t0 = time.perf_counter()
    for s in range(0, args.stream, wave):
        c = min(wave, args.stream - s)
        idx.add(np.arange(n + s, n + s + c),
                gen_chunk(rng, centers, n + s, c, d))
        idx._sync()  # push the delta scatter like a live server would
    jax.block_until_ready(idx._dx)
    t_st = time.perf_counter() - t0
    rep(stage="stream_insert", rows=args.stream, wave=wave,
        rows_per_s=round(args.stream / t_st, 1),
        seconds=round(t_st, 1))

    # the streamed rows must be findable (self-recall on a sample)
    sample = rng.integers(n, n + args.stream, 64)
    sq = idx._hx[sample]
    _, si = idx.search(
        np.concatenate([sq, np.zeros((args.batch - 64, d), np.float32)]),
        args.k)
    self_hit = float(np.mean([
        sample[i] in np.asarray(si)[i] for i in range(64)
    ]))
    rep(stage="stream_verify", self_recall=round(self_hit, 4))

    if args.no_snapshot:
        return

    # ---- snapshot / restore ----
    tmp = tempfile.mkdtemp(prefix="ehtpu_cap_")
    try:
        t0 = time.perf_counter()
        arrs = idx.state_arrays()
        for name, a in arrs.items():
            np.save(os.path.join(tmp, name + ".npy"), a)
        t_snap = time.perf_counter() - t0
        gb = sum(a.nbytes for a in arrs.values()) / 1e9
        rep(stage="snapshot", seconds=round(t_snap, 1), gb=round(gb, 2),
            gb_per_s=round(gb / t_snap, 2))

        ref_q = qv[:8]
        _, before = idx.search(
            np.concatenate([ref_q, np.zeros((args.batch - 8, d),
                                            np.float32)]), args.k)
        before = np.asarray(before)[:8]

        del idx
        t0 = time.perf_counter()
        # copy-on-write mmaps, adopted in place by from_state: restore
        # pages the arena lazily and — with the persisted q_* planes —
        # skips the host re-quantization that dominated the r4 203 s
        # restore-at-10M (store/persistence.load_version does the same)
        arrays = {
            name[:-4]: np.load(os.path.join(tmp, name), mmap_mode="c")
            for name in os.listdir(tmp)
        }
        # no storage_dtype override: flat_meta carries the EFFECTIVE
        # dtype (the guard may have escalated past args.storage, and the
        # persisted q_* planes belong to that dtype)
        idx2 = FlatIndex.from_state(d, "cosine", arrays)
        idx2._sync()
        jax.block_until_ready(idx2._dx)
        t_rest = time.perf_counter() - t0
        _, after = idx2.search(
            np.concatenate([ref_q, np.zeros((args.batch - 8, d),
                                            np.float32)]), args.k)
        same = bool((np.asarray(after)[:8] == before).all())
        rep(stage="restore", seconds=round(t_rest, 1),
            search_identical=same, size=idx2.size)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
