"""TransformEngine — the compute-offload seam (VERDICT r2 item 5).

Reference: SourceTask submits transformations to external engines
(Spark runner provider/scripts/spark/offline_store_spark_runner.py,
k8s jobs provider/k8s.go) instead of executing them in the coordinator.
Here the same submit/poll/fetch contract runs a DF/SQL transformation
through an in-process engine or an isolated worker subprocess, wired
through the coordinator's source task.
"""

import pytest

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore import fferr
from embeddinghub_tpu.featurestore.providers.base import reset_provider_cache
from embeddinghub_tpu.featurestore.transform_engine import (
    FAILED,
    SUCCESS,
    InProcessEngine,
    SubprocessEngine,
    execute_spec,
    get_engine,
    register_engine,
)

ROWS = [
    {"user_id": "u1", "clicks": 10, "ts": 1},
    {"user_id": "u2", "clicks": 20, "ts": 1},
    {"user_id": "u1", "clicks": 15, "ts": 2},
]


@pytest.fixture()
def client():
    reset_provider_cache()
    ff.global_registrar().reset()
    return ff.Client()


def _spec_sql(query="SELECT user_id, SUM(clicks) AS total FROM {{ events.default }} GROUP BY user_id"):
    return {
        "name": "agg", "variant": "default",
        "transformation": {"sql": query},
        "inputs": [["events", "default"]],
        "input_rows": {"events/default": ROWS},
    }


def test_execute_spec_sql():
    rows = execute_spec(_spec_sql())
    totals = {r["user_id"]: r["total"] for r in rows}
    assert totals == {"u1": 25, "u2": 20}


def test_execute_spec_df_source_text():
    src = (
        "def agg(events):\n"
        "    return [{'n': len(events)}]\n"
    )
    spec = {
        "name": "agg", "variant": "default",
        "transformation": {"df": src},
        "inputs": [["events", "default"]],
        "input_rows": {"events/default": ROWS},
    }
    assert execute_spec(spec) == [{"n": 3}]


def test_inprocess_engine_run():
    rows = InProcessEngine().run(_spec_sql())
    assert len(rows) == 2


def test_inprocess_engine_failure():
    eng = InProcessEngine()
    job = eng.submit(_spec_sql("SELECT nope FROM {{ events.default }} WHERE"))
    status, error = eng.poll(job)
    assert status == FAILED and "sql transformation failed" in error
    with pytest.raises(fferr.JobFailedError):
        eng.run(_spec_sql("TOTALLY INVALID"))


def test_subprocess_engine_run(tmp_path):
    eng = SubprocessEngine(workdir=str(tmp_path))
    rows = eng.run(_spec_sql(), timeout_s=120)
    totals = {r["user_id"]: r["total"] for r in rows}
    assert totals == {"u1": 25, "u2": 20}


def test_subprocess_engine_failure(tmp_path):
    eng = SubprocessEngine(workdir=str(tmp_path))
    job = eng.submit(_spec_sql("SELECT FROM WHERE"))
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        status, error = eng.poll(job)
        if status in (SUCCESS, FAILED):
            break
        time.sleep(0.05)
    assert status == FAILED
    assert "worker exited" in error


def test_get_engine_resolution(monkeypatch):
    monkeypatch.delenv("EHTPU_TRANSFORM_ENGINE", raising=False)
    assert get_engine(None) is None
    assert get_engine("native") is None
    assert isinstance(get_engine("inprocess"), InProcessEngine)
    with pytest.raises(fferr.InvalidResourceError):
        get_engine("spark")
    monkeypatch.setenv("EHTPU_TRANSFORM_ENGINE", "inprocess")
    assert isinstance(get_engine(None), InProcessEngine)


def test_register_external_engine():
    class FakeSpark(InProcessEngine):
        pass

    register_engine("fake-spark", FakeSpark)
    try:
        assert isinstance(get_engine("fake-spark"), FakeSpark)
    finally:
        from embeddinghub_tpu.featurestore import transform_engine as te

        te._ENGINES.pop("fake-spark", None)
        te._instances.pop("fake-spark", None)


def _register_base(client):
    reg = client.registrar
    reg.register_user("alice")
    reg.set_default_owner("alice")
    reg.register_sqlite_offline("warehouse")
    reg.register_memory_online("cache")
    reg.register_entity("user")
    reg.register_primary_data(
        "events", provider="warehouse", location={"rows": ROWS}
    )
    return reg


def test_df_transformation_via_subprocess_engine_under_coordinator(client):
    """The VERDICT 'done' criterion: a DF transformation executes via
    the subprocess engine under the coordinator."""
    reg = _register_base(client)

    @reg.df_transformation(
        name="per_user", provider="warehouse",
        inputs=[("events", "default")], engine="subprocess",
    )
    def per_user(events):
        seen = {}
        for r in sorted(events, key=lambda r: r["ts"]):
            seen[r["user_id"]] = r["clicks"]
        return [{"user_id": k, "latest": v} for k, v in seen.items()]

    reg.register_feature(
        "latest_clicks",
        source=("per_user", "default"),
        entity="user",
        entity_column="user_id",
        value_column="latest",
        provider="cache",
    )
    client.apply()
    assert client.features(["latest_clicks"], {"user": "u1"}) == [15]
    # the run log shows the job went through the subprocess engine
    from embeddinghub_tpu.featurestore.resources import (
        ResourceID,
        ResourceType,
    )

    task = client.coordinator.tasks.task_for_target(
        ResourceID(ResourceType.SOURCE_VARIANT, "per_user", "default")
    )
    runs = client.coordinator.tasks.runs_for_task(task.id)
    logs = "\n".join(line for r in runs for line in r.logs)
    assert "SubprocessEngine" in logs


def test_sql_transformation_via_inprocess_engine_under_coordinator(client):
    reg = _register_base(client)

    @reg.sql_transformation(
        name="totals", provider="warehouse",
        inputs=[("events", "default")], engine="inprocess",
    )
    def totals():
        return (
            "SELECT user_id, SUM(clicks) AS total "
            "FROM {{ events.default }} GROUP BY user_id"
        )

    client.apply()
    rows = client.coordinator.provider_for(
        "warehouse"
    ).as_offline_store().table_rows("totals", "default")
    assert {r["user_id"]: r["total"] for r in rows} == {"u1": 25, "u2": 20}


def test_engine_failure_fails_the_task(client):
    reg = _register_base(client)

    @reg.sql_transformation(
        name="broken", provider="warehouse",
        inputs=[("events", "default")], engine="inprocess",
    )
    def broken():
        return "SELECT FROM WHERE"

    client.apply()
    from embeddinghub_tpu.featurestore.resources import (
        ResourceID,
        ResourceType,
        Status,
    )

    assert (
        client.metadata.get(
            ResourceID(ResourceType.SOURCE_VARIANT, "broken", "default")
        ).status
        == Status.FAILED
    )
