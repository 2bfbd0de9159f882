"""Model lineage, columns/location RPCs, reconciliation, tracing,
notifications."""

import json

import pytest

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore.notifications import FileChannel, Notifier
from embeddinghub_tpu.featurestore.providers.base import reset_provider_cache
from embeddinghub_tpu.featurestore.resources import ResourceID, ResourceType
from embeddinghub_tpu.featurestore.scheduling import RunStatus
from embeddinghub_tpu.utils.tracing import span


@pytest.fixture
def client():
    reset_provider_cache()
    ff.global_registrar().reset()
    c = ff.Client()
    reg = c.registrar
    reg.register_sqlite_offline("wh")
    reg.register_memory_online("cache")
    reg.register_entity("user")
    reg.register_primary_data(
        "events",
        provider="wh",
        location={"rows": [{"user_id": "u1", "clicks": 5}]},
    )
    reg.register_feature(
        "clicks",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="clicks",
        provider="cache",
    )
    reg.register_label(
        "lbl",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="clicks",
    )
    reg.register_training_set(
        "m", label=("lbl", "default"), features=[("clicks", "default")]
    )
    c.apply()
    return c


def test_model_lineage(client):
    client.features(["clicks"], {"user": "u1"}, model="my-model")
    client.training_set("m", model="my-model")
    model = client.metadata.get(ResourceID(ResourceType.MODEL, "my-model"))
    assert ("clicks", "default") in model.features
    assert ("m", "default") in model.trainingsets
    # repeated serving doesn't duplicate edges
    client.features(["clicks"], {"user": "u1"}, model="my-model")
    model = client.metadata.get(ResourceID(ResourceType.MODEL, "my-model"))
    assert model.features.count(("clicks", "default")) == 1


def test_reconcile_requeues_stale_running(client):
    tasks = client.coordinator.tasks
    task = tasks.create_task("stuck", "noop", ResourceID(ResourceType.USER, "x"))
    run = tasks.create_run(task.id)
    tasks.set_run_status(run.run_id, RunStatus.RUNNING)
    run.started_at = 0.0  # ancient
    n = client.coordinator.reconcile(stale_after_s=1.0)
    assert n == 1
    assert tasks.run(run.run_id).status == RunStatus.PENDING


def test_reconcile_skips_locked(client):
    tasks = client.coordinator.tasks
    task = tasks.create_task("held", "noop", ResourceID(ResourceType.USER, "y"))
    run = tasks.create_run(task.id)
    tasks.set_run_status(run.run_id, RunStatus.RUNNING)
    run.started_at = 0.0
    key = client.coordinator.locker.lock(f"task/{task.id}")
    try:
        assert client.coordinator.reconcile(stale_after_s=1.0) == 0
    finally:
        client.coordinator.locker.unlock(key)


def test_notifier_file_channel(tmp_path):
    path = tmp_path / "events.jsonl"
    n = Notifier([FileChannel(str(path))])
    n.task_run("t", 1, "FAILED", "boom")
    n.resource_status("FEATURE_VARIANT/f/default", "READY")
    lines = [json.loads(line) for line in path.read_text().splitlines()]
    assert lines[0]["kind"] == "task_run" and lines[0]["error"] == "boom"
    assert lines[1]["kind"] == "resource_status"


def test_span_logs(capsys):
    with span("unit-test-span", foo="bar"):
        pass
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["span"] == "unit-test-span" and rec["foo"] == "bar"
    assert rec["ms"] >= 0


def test_columns_and_location_rpcs(client):
    import grpc

    from embeddinghub_tpu.featurestore.proto import serving_pb2 as pb
    from embeddinghub_tpu.featurestore.proto import serving_pb2_grpc as pbg
    from embeddinghub_tpu.featurestore.serving_grpc import build_server

    server = build_server("127.0.0.1:0", client)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    ch = grpc.insecure_channel(f"127.0.0.1:{port}")
    stub = pbg.FeatureStub(ch)

    req = pb.TrainingDataColumnsRequest()
    req.id.name = "m"
    cols = stub.TrainingDataColumns(req)
    assert list(cols.features) == ["clicks.default"] and cols.label == "lbl.default"

    sreq = pb.SourceColumnRequest()
    sreq.id.name = "events"
    scols = stub.SourceColumns(sreq)
    assert set(scols.columns) == {"user_id", "clicks"}

    lreq = pb.ResourceIdRequest(name="events", variant="default")
    loc = stub.GetResourceLocation(lreq)
    assert "events" in loc.location
    ch.close()
    server.stop(0)


def test_scheduled_refresh(client):
    """Sources/features with refresh_interval_s re-run on schedule."""
    import time

    state = {"v": 1}
    reg = client.registrar

    @reg.df_transformation(
        name="live", provider="wh", inputs=[("events", "default")],
        refresh_interval_s=0.01,
    )
    def live(events):
        return [{"user_id": r["user_id"], "val": state["v"]} for r in events]

    reg.register_feature(
        "liveval",
        source=("live", "default"),
        entity="user",
        entity_column="user_id",
        value_column="val",
        provider="cache",
        refresh_interval_s=0.01,
    )
    client.apply()
    assert client.features(["liveval"], {"user": "u1"}) == [1]
    state["v"] = 2
    time.sleep(0.05)
    created = client.coordinator.schedule_refreshes()
    assert created >= 2  # source + feature refresh runs
    client.coordinator.run_pending_sync()
    assert client.features(["liveval"], {"user": "u1"}) == [2]


def test_webhook_notification_channel():
    """WebhookChannel POSTs Slack-attachment-shaped JSON (reference
    integrations/slack_client.go PostStatusChangeMessage) — exercised
    against a loopback HTTP collector."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from embeddinghub_tpu.featurestore.notifications import (
        Notifier,
        WebhookChannel,
    )

    got = []

    class Collector(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            got.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/hook"
        n = Notifier([WebhookChannel(url, dashboard_url="http://dash")])
        n.resource_status("FEATURE_VARIANT/clicks/default", "READY")
        n.task_run("materialize", 7, "FAILED", error="boom")
    finally:
        srv.shutdown()
    assert len(got) == 2
    ready, failed = got
    assert ready["attachments"][0]["color"] == "#00FF00"
    assert ready["event"]["resource"] == "FEATURE_VARIANT/clicks/default"
    assert any(f["title"] == "Status" and f["value"] == "READY"
               for f in ready["attachments"][0]["fields"])
    assert ready["attachments"][0]["actions"][0]["url"] == "http://dash"
    assert failed["attachments"][0]["color"] == "#FF0000"
    assert failed["event"]["error"] == "boom"
    # webhook failures are swallowed (notification is never fatal)
    bad = Notifier([WebhookChannel("http://127.0.0.1:1/nope", timeout=0.2)])
    bad.resource_status("x", "READY")
