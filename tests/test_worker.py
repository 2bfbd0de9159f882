"""Worker binary + indexed process spawner (reference
runner/worker/worker.go + kubernetes IndexedCompletion Jobs)."""

import json
import os

import pytest

from embeddinghub_tpu.featurestore.providers import get_provider
from embeddinghub_tpu.featurestore.worker import (
    run_from_env,
    run_materialize_job,
    spawn_indexed,
)

import embeddinghub_tpu.featurestore.providers.sqlite_offline  # noqa: F401
import embeddinghub_tpu.featurestore.providers.sqlite_online  # noqa: F401


@pytest.fixture()
def job_cfg(tmp_path):
    off_path = str(tmp_path / "offline.db")
    on_path = str(tmp_path / "online.db")
    offline = get_provider(
        "SQLITE_OFFLINE", {"path": off_path}, cache_key=off_path
    ).as_offline_store()
    offline.write_rows(
        "clicks", "v1",
        [
            {"user": f"u{i}", "score": float(i), "ts": i}
            for i in range(257)
        ],
    )
    return {
        "job": "materialize",
        "offline": {"type": "SQLITE_OFFLINE", "config": {"path": off_path}},
        "online": {"type": "SQLITE_ONLINE", "config": {"path": on_path}},
        "source": {
            "name": "clicks", "variant": "v1",
            "entity_column": "user", "value_column": "score",
            "timestamp_column": "ts",
        },
        "feature": {"name": "score", "variant": "v1"},
        "chunk_size": 64,
    }


def _verify_all_rows(cfg):
    online = get_provider(
        "SQLITE_ONLINE", cfg["online"]["config"],
        cache_key=cfg["online"]["config"]["path"],
    ).as_online_store()
    table = online.get_table("score", "v1")
    assert sorted(table.entities()) == sorted(f"u{i}" for i in range(257))
    assert table.get("u42") == 42.0


def test_single_worker_in_process(job_cfg):
    res = run_materialize_job(job_cfg, 0, 1)
    assert res == {"chunks": 5, "rows": 257}
    _verify_all_rows(job_cfg)


def test_sharded_workers_cover_all_chunks(job_cfg):
    """Two workers split chunks by completion index; the union covers
    every row exactly once."""
    r0 = run_materialize_job(job_cfg, 0, 2)
    r1 = run_materialize_job(job_cfg, 1, 2)
    assert r0["chunks"] + r1["chunks"] == 5
    assert r0["rows"] + r1["rows"] == 257
    _verify_all_rows(job_cfg)


def test_run_from_env_reads_completion_index(job_cfg):
    env = {
        "FF_WORKER_CONFIG": json.dumps(job_cfg),
        "JOB_COMPLETION_INDEX": "1",
        "FF_TOTAL_WORKERS": "2",
    }
    res = run_from_env(env)
    assert res["chunks"] == 2  # chunks 1 and 3 of 5


def test_spawn_indexed_subprocesses(job_cfg):
    """Real subprocess workers (the k8s-Job analog) write into the
    shared sqlite online store."""
    results = spawn_indexed(job_cfg, workers=2, timeout=120)
    assert sum(r["rows"] for r in results) == 257
    _verify_all_rows(job_cfg)


def test_unknown_job_rejected(job_cfg):
    env = {"FF_WORKER_CONFIG": json.dumps({**job_cfg, "job": "nope"})}
    with pytest.raises(ValueError):
        run_from_env(env)
