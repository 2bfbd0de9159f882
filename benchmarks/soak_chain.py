"""Chained at-scale soak: concurrent insert/query/snapshot on a
cluster-built graph-backed store, across MANY short processes.

The dev harness caps TPU-attached processes at ~10 minutes, so a
"30-minute soak" here is a CHAIN of segments, each its own process on
the persistent store (WAL + snapshots).  That cap is a feature for the
test: every segment boundary is a full process death + recovery, and a
``--kill`` segment dies MID-WRITE (os._exit while the writer threads
are hot) so the next segment proves WAL-tail replay under real
concurrent load — the safety contract the reference buys with one
global mutex (embeddingstore/server.h:65) and we buy with per-version
locks + the write batcher.

Usage (one segment per invocation; state persists in --dir):
  # segment 0 seeds the store from a saved 1M graph + its gt file:
  python benchmarks/soak_chain.py --dir /tmp/ehtpu_soak \
      --graph /tmp/ehtpu_graph_1m.npz --gt /tmp/cb_1m.npz --seconds 360
  # further segments: same command (graph/gt ignored once seeded);
  # add --kill to die mid-write instead of closing cleanly.

Each segment appends one JSON line to <dir>/soak_log.jsonl:
inserts, queries, recall@10 vs the (fixed) base ground truth, WAL
replay evidence, errors.
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPACE = "soak"


def rep(**kv):
    print(json.dumps(kv), flush=True)


def seed(args) -> None:
    """Segment 0: store <- saved graph (keys r%08d) + queries/gt."""
    from embeddinghub_tpu.index.hnsw import HNSWIndex
    from embeddinghub_tpu.store import EmbeddingHub

    z = np.load(args.graph)
    idx = HNSWIndex.from_state(args.dims, "l2", {k: z[k] for k in z.files})
    hub = EmbeddingHub.load_or_create(args.dir, engine="hnsw")
    hub.create_space(SPACE, dims=args.dims)
    ver = hub.get_version(SPACE)
    ver.index = idx
    n = int(idx.size)
    ver.keymap.assign_many([f"r{i:08d}" for i in range(n)])
    t0 = time.perf_counter()
    hub.save()
    json.dump({"base_rows": n},
              open(os.path.join(args.dir, "soak_base.json"), "w"))
    rep(stage="seed", rows=n, save_s=round(time.perf_counter() - t0, 1))


def segment(args) -> None:
    import jax  # noqa: F401  (claims the chip in this process)

    from embeddinghub_tpu.store import EmbeddingHub

    t_open = time.perf_counter()
    hub = EmbeddingHub.load_or_create(args.dir, engine="hnsw")
    ver = hub.get_version(SPACE)
    open_s = time.perf_counter() - t_open
    size0 = ver.size

    zgt = np.load(args.gt)
    test, gt = zgt["test"], zgt["gt"]
    k = 10
    base_rows = json.loads(
        open(os.path.join(args.dir, "soak_base.json")).read()
    )["base_rows"]

    # --- verify last segment's tail survived (WAL replay evidence) ---
    state_path = os.path.join(args.dir, "soak_state.json")
    prev = None
    if os.path.exists(state_path):
        prev = json.loads(open(state_path).read())
        expect = prev["expected_rows"]
        missing = [key for key in prev["probe_keys"] if key not in ver]
        rep(stage="recovery_check", expected_rows=expect,
            found_rows=size0, probe_missing=len(missing),
            after_kill=prev.get("killed", False))
        assert not missing, f"WAL replay lost keys: {missing[:5]}"

    stop = threading.Event()
    errors: list = []
    counts = {"inserts": 0, "queries": 0, "reads": 0, "snapshots": 0}
    lock = threading.Lock()
    rng0 = np.random.default_rng(int(time.time()) % 2**31)
    seg_id = prev["segment"] + 1 if prev else 1

    def guard(fn):
        def run():
            try:
                while not stop.is_set():
                    fn()
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))
                stop.set()
        return run

    local = threading.local()

    def writer():
        r = getattr(local, "rng", None)
        if r is None:
            local.rng = r = np.random.default_rng(
                threading.get_ident() % 2**31)
        wave = [(f"s{seg_id:02d}_{r.integers(0, 1 << 30):08x}",
                 r.standard_normal(args.dims).astype(np.float32))
                for _ in range(256)]
        with ver.lock:
            ver.multiset(wave)
        with lock:
            counts["inserts"] += len(wave)

    def searcher():
        q = test[rng0.integers(0, len(test), 64)]
        with ver.lock:
            got = ver.nearest_batch(q, k)
        assert len(got) == 64
        with lock:
            counts["queries"] += 64

    def reader():
        # only the seeded base keys are named r%08d; segment writes use
        # their own s<seg>_ prefix
        key = f"r{rng0.integers(0, base_rows):08d}"
        v = ver.get(key)
        assert v.shape == (args.dims,)
        with lock:
            counts["reads"] += 1

    def snapshotter():
        time.sleep(args.snapshot_every)
        if stop.is_set():
            return
        with ver.lock:
            hub.save()
        with lock:
            counts["snapshots"] += 1

    threads = [threading.Thread(target=guard(fn), daemon=True)
               for fn in (writer, writer, searcher, reader, snapshotter)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()

    deadline = t0 + args.seconds
    killed = False
    while time.perf_counter() < deadline and not stop.is_set():
        time.sleep(1.0)
        if args.kill and time.perf_counter() - t0 > args.seconds * 0.6:
            # record what must survive, then die mid-write
            with lock:
                snap_counts = dict(counts)
            # probe keys: sample of keys already ACKed to writers — after
            # the crash these must come back via snapshot+WAL replay
            with ver.lock:
                all_new = [key for key in ver.keymap._key_to_row
                           if key.startswith(f"s{seg_id:02d}_")]
                probe = all_new[:64]
                expected = ver.size
            json.dump(
                {"segment": seg_id, "expected_rows": expected,
                 "probe_keys": probe, "killed": True,
                 "counts": snap_counts},
                open(state_path + ".tmp", "w"))
            os.replace(state_path + ".tmp", state_path)
            rep(stage="killing", at_s=round(time.perf_counter() - t0, 1),
                **snap_counts)
            sys.stdout.flush()
            killed = True
            os._exit(137)  # simulated crash: no close, no final save

    stop.set()
    for t in threads:
        t.join(timeout=30)

    # --- recall spot-check: the BASE ground truth must stay findable.
    # The gt is frozen at seed time while writers add same-distribution
    # rows, so new rows legitimately enter the true top-k; filtering
    # the search result to base rows measures what soak must preserve —
    # graph reachability of the original neighbors — without the
    # stale-gt artifact (smoke run: raw recall "decayed" 0.97 -> 0.81
    # purely from 28% arena growth). ---
    with ver.lock:
        got = ver.index.search(test, 2 * k, ef=100 + k)[1]
    got = np.asarray(got)

    def base_first(row):
        keep = [i for i in row.tolist() if 0 <= i < base_rows]
        return keep[:k]

    rec = float(np.mean([
        len(set(base_first(got[i])) & set(gt[i].tolist())) / k
        for i in range(len(test))
    ]))

    with ver.lock:
        hub.save()
        all_new = [key for key in ver.keymap._key_to_row
                   if key.startswith(f"s{seg_id:02d}_")]
        json.dump(
            {"segment": seg_id, "expected_rows": ver.size,
             "probe_keys": all_new[:64], "killed": False,
             "counts": counts},
            open(state_path + ".tmp", "w"))
        os.replace(state_path + ".tmp", state_path)

    line = {
        "segment": seg_id, "seconds": round(time.perf_counter() - t0, 1),
        "open_s": round(open_s, 1), "size_start": size0,
        "size_end": ver.size, "recall_ef100": round(rec, 4),
        "errors": errors, **counts,
    }
    with open(os.path.join(args.dir, "soak_log.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")
    rep(stage="segment_done", **line)
    assert not errors, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ehtpu_soak")
    ap.add_argument("--graph", default="/tmp/ehtpu_graph_1m.npz")
    ap.add_argument("--gt", default="/tmp/cb_1m.npz")
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=360.0)
    ap.add_argument("--snapshot-every", type=float, default=60.0)
    ap.add_argument("--kill", action="store_true",
                    help="die mid-write at 60%% of the segment (crash "
                         "recovery drill; next segment must replay)")
    args = ap.parse_args()
    if not os.path.exists(os.path.join(args.dir, "manifest.json")) and \
            not os.path.exists(os.path.join(args.dir, SPACE)):
        seed(args)
    segment(args)


if __name__ == "__main__":
    main()
