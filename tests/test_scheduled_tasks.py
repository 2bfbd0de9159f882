"""Scheduled (cron-lite) task execution.

Reference: CronJob scheduling (kubernetes/kubernetes.go:223-236) and the
RequestScheduleChange RPC.  Here a schedule string on a task makes the
coordinator poll loop create a fresh PENDING run once the last READY run
is older than the interval, so sources/features re-run on schedule.
"""

import time

import grpc
import pytest

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore import fferr
from embeddinghub_tpu.featurestore.providers.base import (
    get_provider,
    reset_provider_cache,
)
from embeddinghub_tpu.featurestore.resources import ResourceID, ResourceType
from embeddinghub_tpu.featurestore.scheduling import parse_schedule


@pytest.fixture()
def client():
    reset_provider_cache()
    ff.global_registrar().reset()
    return ff.Client()


ROWS = [
    {"user_id": "u1", "clicks": 10, "ts": 1},
    {"user_id": "u2", "clicks": 20, "ts": 1},
]


def _register_basic(client):
    reg = client.registrar
    reg.register_user("alice")
    reg.set_default_owner("alice")
    reg.register_sqlite_offline("warehouse")
    reg.register_memory_online("cache")
    reg.register_entity("user")
    reg.register_primary_data(
        "events", provider="warehouse", location={"rows": ROWS}
    )
    reg.register_feature(
        "clicks",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="clicks",
        timestamp_column="ts",
        provider="cache",
    )


def test_parse_schedule_forms():
    assert parse_schedule("@every 30s") == 30.0
    assert parse_schedule("@every 5m") == 300.0
    assert parse_schedule("@every 1.5h") == 5400.0
    assert parse_schedule("@every 50ms") == 0.05
    assert parse_schedule("90") == 90.0
    assert parse_schedule("*/5 * * * *") == 300.0
    assert parse_schedule("* * * * *") == 60.0
    assert parse_schedule("") is None
    assert parse_schedule(None) is None
    with pytest.raises(ValueError):
        parse_schedule("0 9 * * 1-5")
    with pytest.raises(ValueError):
        parse_schedule("whenever")


def test_feature_rematerializes_on_schedule(client):
    _register_basic(client)
    client.apply()
    assert client.features(["clicks"], {"user": "u1"}) == [10]

    # new upstream data lands in the offline table
    offline = get_provider(
        "SQLITE_OFFLINE", {}, cache_key="warehouse"
    ).as_offline_store()
    offline.write_rows(
        "events", "default",
        ROWS + [{"user_id": "u1", "clicks": 99, "ts": 5}],
    )

    coord = client.coordinator
    task = coord.tasks.task_for_target(
        ResourceID(ResourceType.FEATURE_VARIANT, "clicks", "default")
    )
    coord.tasks.set_schedule(task.id, "@every 50ms")

    # not due yet right after the READY run? (interval may already have
    # elapsed — only assert the due path below)
    time.sleep(0.06)
    created = coord.schedule_refreshes()
    assert created >= 1
    coord.run_pending_sync()
    assert client.features(["clicks"], {"user": "u1"}) == [99]

    # a second tick before the interval elapses does NOT stack runs:
    # the refreshed run just became READY "now"
    coord.tasks.set_schedule(task.id, "@every 1h")
    assert coord.schedule_refreshes() == 0


def test_source_transformation_reruns_on_schedule(client):
    _register_basic(client)
    reg = client.registrar

    @reg.sql_transformation(
        name="totals", provider="warehouse", inputs=[("events", "default")]
    )
    def totals():
        return "SELECT user_id, SUM(clicks) AS total FROM {{ events.default }} GROUP BY user_id"

    client.apply()
    coord = client.coordinator
    task = coord.tasks.task_for_target(
        ResourceID(ResourceType.SOURCE_VARIANT, "totals", "default")
    )
    runs_before = len(coord.tasks.runs_for_task(task.id))
    coord.tasks.set_schedule(task.id, "@every 50ms")
    time.sleep(0.06)
    assert coord.schedule_refreshes() >= 1
    coord.run_pending_sync()
    runs_after = coord.tasks.runs_for_task(task.id)
    assert len(runs_after) == runs_before + 1
    last = max(runs_after, key=lambda r: r.run_id)
    assert last.status.value == "READY"


def test_request_schedule_change_wire(client, tmp_path):
    """RequestScheduleChange over the wire attaches the schedule to the
    target's task; bad schedules / unknown targets are rejected."""
    from embeddinghub_tpu.featurestore.metadata_grpc import build_server
    from embeddinghub_tpu.featurestore.proto import ff_metadata_pb2 as pb
    from embeddinghub_tpu.featurestore.proto.ff_metadata_grpc import (
        MetadataStub,
    )

    import socket

    _register_basic(client)
    client.apply()
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    server = build_server(
        f"127.0.0.1:{port}", client.metadata, client.coordinator
    )
    server.start()
    try:
        stub = MetadataStub(grpc.insecure_channel(f"127.0.0.1:{port}"))
        rid = pb.ResourceID(
            resource=pb.NameVariant(name="clicks", variant="default"),
            resource_type=pb.ResourceType.FEATURE_VARIANT,
        )
        stub.RequestScheduleChange(
            pb.ScheduleChangeRequest(resource_id=rid, schedule="@every 2m")
        )
        task = client.coordinator.tasks.task_for_target(
            ResourceID(ResourceType.FEATURE_VARIANT, "clicks", "default")
        )
        assert task.schedule == "@every 2m"

        with pytest.raises(grpc.RpcError) as exc:
            stub.RequestScheduleChange(
                pb.ScheduleChangeRequest(resource_id=rid, schedule="junk")
            )
        assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT

        bad = pb.ResourceID(
            resource=pb.NameVariant(name="ghost", variant="v0"),
            resource_type=pb.ResourceType.FEATURE_VARIANT,
        )
        with pytest.raises(grpc.RpcError) as exc:
            stub.RequestScheduleChange(
                pb.ScheduleChangeRequest(resource_id=bad, schedule="@every 2m")
            )
        assert exc.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        server.stop(0)


def test_set_schedule_validates(client):
    _register_basic(client)
    client.apply()
    coord = client.coordinator
    task = coord.tasks.task_for_target(
        ResourceID(ResourceType.FEATURE_VARIANT, "clicks", "default")
    )
    with pytest.raises(ValueError):
        coord.tasks.set_schedule(task.id, "not-a-schedule")
    with pytest.raises(fferr.ResourceNotFoundError):
        coord.tasks.set_schedule(99999, "@every 1m")
