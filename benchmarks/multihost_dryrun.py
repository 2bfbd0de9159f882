"""Multi-host sharded-index dry run (BASELINE config 5 mechanics).

Spawns N python processes, each with its own set of virtual CPU
devices, joined through ``jax.distributed`` (the same runtime that
spans DCN on real multi-host TPU pods).  The sharded search step —
per-shard fused top-k + all-gather merge — is jitted over the GLOBAL
mesh; each process holds only its local shard of the index and the
collective crosses the process boundary.

Run:  python benchmarks/multihost_dryrun.py [--procs 2] [--local-devices 4]
Prints PASS plus the verified top-1 ids on success.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, num_processes: int, local_devices: int, port: int,
           rows_per_device: int = 128, dims: int = 16):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from embeddinghub_tpu.ops.topk import chunked_topk_search
    from embeddinghub_tpu.parallel.mesh import SHARD_AXIS

    n_dev = num_processes * local_devices
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), (SHARD_AXIS,))
    # --rows-per-device scales the flat leg to config-5-relevant shard
    # sizes (VERDICT r2 item 4: >= 1M rows per process) while the
    # default stays tiny for the driver/test dryrun.
    cap_local, d, b, k = rows_per_device, dims, 8, 4
    cap = cap_local * n_dev
    chunk = min(cap_local, 1 << 17)
    while cap_local % chunk:
        chunk >>= 1

    rng = np.random.default_rng(0)
    x_global = rng.standard_normal((cap, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    # plant exact matches so the result is verifiable
    targets = np.arange(0, cap, cap // b)[:b]
    x_global[targets] = q

    row_shard = NamedSharding(mesh, P(SHARD_AXIS))
    repl = NamedSharding(mesh, P())
    # each process contributes only its local rows
    xg = jax.make_array_from_callback(
        (cap, d), row_shard, lambda idx: x_global[idx]
    )
    xsq = jax.make_array_from_callback(
        (cap,),
        row_shard,
        lambda idx: np.einsum("nd,nd->n", x_global[idx[0]], x_global[idx[0]]),
    )
    valid = jax.make_array_from_callback(
        (cap,), row_shard, lambda idx: np.ones(cap, bool)[idx]
    )
    qd = jax.device_put(q, repl)

    def local_search(q, x, valid, x_sq):
        dist, idx = chunked_topk_search(
            q, x, valid, x_sq, metric="l2", k=k, chunk=chunk
        )
        shard = jax.lax.axis_index(SHARD_AXIS)
        idx = jnp.where(idx >= 0, idx + shard * cap_local, -1)
        dg = jax.lax.all_gather(dist, SHARD_AXIS)
        ig = jax.lax.all_gather(idx, SHARD_AXIS)
        dd = jnp.transpose(dg, (1, 0, 2)).reshape(q.shape[0], -1)
        ii = jnp.transpose(ig, (1, 0, 2)).reshape(q.shape[0], -1)
        nd, pos = jax.lax.top_k(-dd, k)
        return -nd, jnp.take_along_axis(ii, pos, axis=1)

    fn = jax.jit(
        jax.shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P(None, None), P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
    )
    import time as _time

    dist, idx = fn(qd, xg, valid, xsq)
    t0 = _time.perf_counter()
    dist, idx = fn(qd, xg, valid, xsq)
    got = np.asarray(jax.device_get(idx))[:, 0]
    search_s = _time.perf_counter() - t0
    assert (got == targets).all(), (got, targets)
    if process_id == 0:
        print(
            f"PASS multihost {num_processes}x{local_devices}: "
            f"{cap_local} rows/device x {d}d, top-1 {got.tolist()}, "
            f"sharded search {search_s*1e3:.0f} ms",
            flush=True,
        )

    # --- HBM shard snapshot / restore across the process boundary ---
    # Each process persists ONLY its addressable shards (the real
    # multi-host flow: one snapshot file per host, no cross-host
    # gather — the RocksDB-replacement persistence of BASELINE config
    # 5), then the global sharded arrays are reassembled from the
    # per-host files and the same jitted search must return identical
    # ids.
    import tempfile

    snap_dir = os.environ.get("EHTPU_DRYRUN_SNAPDIR")
    if snap_dir is None:
        snap_dir = os.path.join(tempfile.gettempdir(), "ehtpu_mh_snap")
    os.makedirs(snap_dir, exist_ok=True)
    for name, arr in (("x", xg), ("xsq", xsq), ("valid", valid)):
        for sh in arr.addressable_shards:
            start = sh.index[0].start or 0
            np.save(
                os.path.join(snap_dir, f"{name}.{start}.npy"),
                np.asarray(sh.data),
            )
    # all hosts must finish writing before any host reassembles
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ehtpu_snapshot_written")

    # restore: every process mmaps the per-offset files it owns
    def _restore(name, shape, dtype):
        def cb(idx):
            start = idx[0].start or 0
            return np.load(
                os.path.join(snap_dir, f"{name}.{start}.npy"), mmap_mode="r"
            )
        return jax.make_array_from_callback(
            shape, row_shard if len(shape) > 1 else
            NamedSharding(mesh, P(SHARD_AXIS)), cb
        )

    xg2 = _restore("x", (cap, d), np.float32)
    xsq2 = _restore("xsq", (cap,), np.float32)
    valid2 = _restore("valid", (cap,), bool)
    d2, i2 = fn(qd, xg2, valid2, xsq2)
    assert (np.asarray(jax.device_get(i2)) == np.asarray(jax.device_get(idx))).all()
    if process_id == 0:
        print(
            f"PASS multihost snapshot/restore: per-host shard files, "
            f"identical search ids after reassembly",
            flush=True,
        )

    # --- sharded GRAPH engine across processes: every process builds
    # the identical per-shard graphs (deterministic seeds), the stacked
    # state is device_put onto the GLOBAL mesh (jax verifies the SPMD
    # consistency), and the per-shard beam + all-gather merge crosses
    # the process boundary exactly like the flat leg above ---
    from embeddinghub_tpu.parallel.sharded_hnsw import ShardedHNSWIndex

    n_rows = n_dev * 96
    gx = rng.standard_normal((n_rows, d)).astype(np.float32)
    gidx = ShardedHNSWIndex(
        d, mesh=mesh, m=8, ef_construction=32, capacity=n_rows
    )
    gidx.add(np.arange(n_rows), gx)
    probe = np.arange(0, n_rows, n_rows // 8)[:8]
    _, gi = gidx.search(gx[probe] + 1e-5, 1, ef=32)
    assert (gi[:, 0] == probe).mean() >= 0.9, (gi[:, 0].tolist(), probe.tolist())
    if process_id == 0:
        print(
            f"PASS multihost graph {num_processes}x{local_devices}: "
            f"top-1 {gi[:, 0].tolist()}",
            flush=True,
        )
    jax.distributed.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--port", type=int, default=29711)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--rows-per-device", type=int, default=128)
    ap.add_argument("--dims", type=int, default=16)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.procs, args.local_devices, args.port,
               args.rows_per_device, args.dims)
        return

    procs = []
    for i in range(args.procs):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker", str(i),
                    "--procs", str(args.procs),
                    "--local-devices", str(args.local_devices),
                    "--port", str(args.port),
                    "--rows-per-device", str(args.rows_per_device),
                    "--dims", str(args.dims),
                ],
            )
        )
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker failures: {rc}")


if __name__ == "__main__":
    main()
