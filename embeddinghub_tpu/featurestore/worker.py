"""Materialization worker binary + indexed process spawner.

Reference analog: ``runner/worker/worker.go`` — the container
entrypoint k8s runs for sharded offline->online copies.  Each indexed
pod reads ``JOB_COMPLETION_INDEX`` (set by the Job's IndexedCompletion
mode, ``kubernetes/kubernetes.go:172-197``) and copies its chunk of the
materialization through ``MaterializedChunkRunner`` (``runner/copy.go``).

Here the job config travels as JSON in ``FF_WORKER_CONFIG``; chunks are
assigned ``chunk % FF_TOTAL_WORKERS == JOB_COMPLETION_INDEX`` (one
process can own many chunks — the degenerate single-worker case is the
in-process runner).  ``spawn_indexed`` is the KubernetesJobSpawner
analog on plain subprocesses.

Run:  FF_WORKER_CONFIG='{"job": "materialize", ...}' \
      JOB_COMPLETION_INDEX=0 FF_TOTAL_WORKERS=2 \
      python -m embeddinghub_tpu.featurestore.worker
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from embeddinghub_tpu.featurestore import logging as fflog
from embeddinghub_tpu.featurestore.providers import base, get_provider

# factory registration side effects (cheap, host-only providers; the
# engine vector store imports jax, so it loads lazily on demand)
import embeddinghub_tpu.featurestore.providers.memory_online  # noqa: F401
import embeddinghub_tpu.featurestore.providers.sqlite_offline  # noqa: F401
import embeddinghub_tpu.featurestore.providers.sqlite_online  # noqa: F401
import embeddinghub_tpu.featurestore.providers.redis_online  # noqa: F401

LOG = fflog.Logger("worker")


def _ensure_factory(ptype: str) -> None:
    if ptype.upper().startswith("EMBEDDINGHUB"):
        import embeddinghub_tpu.featurestore.providers.engine_vector  # noqa: F401


def run_materialize_job(cfg: dict, worker_index: int, total_workers: int) -> dict:
    """Copy this worker's share of a materialization offline -> online.

    cfg keys: offline {type, config}, online {type, config},
    source {name, variant, entity_column, value_column,
    [timestamp_column]}, feature {name, variant}, [chunk_size].
    """
    _ensure_factory(cfg["offline"]["type"])
    _ensure_factory(cfg["online"]["type"])
    offline = get_provider(
        cfg["offline"]["type"], cfg["offline"].get("config", {})
    ).as_offline_store()
    online = get_provider(
        cfg["online"]["type"], cfg["online"].get("config", {})
    ).as_online_store()

    src = cfg["source"]
    mat = offline.materialize(
        src["name"],
        src["variant"],
        src["entity_column"],
        src["value_column"],
        src.get("timestamp_column", ""),
    )
    if cfg.get("chunk_size"):
        mat._chunk = max(1, int(cfg["chunk_size"]))

    feat = cfg["feature"]
    table = online.create_table(feat["name"], feat["variant"])
    rows = 0
    chunks = 0
    for ci in range(mat.num_chunks()):
        if ci % total_workers != worker_index:
            continue
        batch = list(mat.iterate_chunk(ci))
        table.batch_set(batch)
        rows += len(batch)
        chunks += 1
    LOG.info(
        "materialize_done", feature=feat["name"], variant=feat["variant"],
        worker=worker_index, of=total_workers, chunks=chunks, rows=rows,
    )
    return {"chunks": chunks, "rows": rows}


_JOBS = {"materialize": run_materialize_job}


def run_from_env(environ=None) -> dict:
    env = environ if environ is not None else os.environ
    cfg = json.loads(env["FF_WORKER_CONFIG"])
    # k8s IndexedCompletion convention, worker.go:39
    idx = int(env.get("JOB_COMPLETION_INDEX", "0"))
    total = int(env.get("FF_TOTAL_WORKERS", "1"))
    job = cfg.get("job", "materialize")
    if job not in _JOBS:
        raise ValueError(f"unknown worker job {job!r}")
    return _JOBS[job](cfg, idx, total)


def spawn_indexed(cfg: dict, workers: int, timeout: float = 300.0) -> list[dict]:
    """KubernetesJobSpawner analog: one subprocess per completion index,
    all running this module as their entrypoint."""
    procs = []
    for i in range(workers):
        env = dict(os.environ)
        env["FF_WORKER_CONFIG"] = json.dumps(cfg)
        env["JOB_COMPLETION_INDEX"] = str(i)
        env["FF_TOTAL_WORKERS"] = str(workers)
        # workers are pure-host jobs: never let them claim the TPU
        env.setdefault("JAX_PLATFORMS", "cpu")
        env.setdefault("PALLAS_AXON_POOL_IPS", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "embeddinghub_tpu.featurestore.worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    results = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=timeout)
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} failed rc={p.returncode}:\n{err[-2000:]}"
            )
        results.append(json.loads(out.strip().splitlines()[-1]))
    return results


def main() -> int:
    res = run_from_env()
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
