"""Serving gRPC, dashboard HTTP, CLI, metrics, search, health tests."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore.dashboard import DashboardServer
from embeddinghub_tpu.featurestore.logging import Logger, new_request_id
from embeddinghub_tpu.featurestore.metrics import MetricsHandler
from embeddinghub_tpu.featurestore.providers.base import reset_provider_cache
from embeddinghub_tpu.featurestore.search import SearchIndex


ROWS = [
    {"user_id": "u1", "clicks": 10, "vec": [1.0, 0.0], "ts": 1},
    {"user_id": "u2", "clicks": 20, "vec": [0.0, 1.0], "ts": 1},
]


@pytest.fixture
def applied_client():
    reset_provider_cache()
    ff.global_registrar().reset()
    client = ff.Client()
    reg = client.registrar
    reg.register_sqlite_offline("wh")
    reg.register_memory_online("cache")
    reg.register_engine_vector_store("vec")
    reg.register_entity("user")
    reg.register_primary_data("events", provider="wh", location={"rows": ROWS})
    reg.register_feature(
        "clicks",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="clicks",
        provider="cache",
    )
    reg.register_embedding_feature(
        "uvec",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="vec",
        dims=2,
        provider="vec",
    )
    reg.register_label(
        "clicked",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="clicks",
    )
    reg.register_training_set(
        "model", label=("clicked", "default"), features=[("clicks", "default")]
    )
    client.apply()
    return client


@pytest.fixture
def grpc_serving(applied_client):
    import grpc

    from embeddinghub_tpu.featurestore.serving_grpc import build_server
    from embeddinghub_tpu.featurestore.proto import serving_pb2 as pb
    from embeddinghub_tpu.featurestore.proto import serving_pb2_grpc as pbg

    server = build_server("127.0.0.1:0", applied_client)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    stub = pbg.FeatureStub(channel)
    yield stub, pb
    channel.close()
    server.stop(0)


def test_grpc_feature_serve(grpc_serving):
    stub, pb = grpc_serving
    req = pb.FeatureServeRequest()
    f = req.features.add()
    f.name, f.version = "clicks", "default"
    e = req.entities.add()
    e.name = "user"
    e.values.append("u2")
    row = stub.FeatureServe(req)
    assert row.value_lists[0].values[0].int64_value == 20


def test_grpc_nearest(grpc_serving):
    stub, pb = grpc_serving
    req = pb.NearestRequest()
    req.id.name, req.id.version = "uvec", "default"
    req.vector.value[:] = [0.9, 0.1]
    req.k = 1
    resp = stub.Nearest(req)
    assert list(resp.entities) == ["u1"]


def test_grpc_training_data(grpc_serving):
    stub, pb = grpc_serving
    req = pb.TrainingDataRequest()
    req.id.name, req.id.version = "model", "default"
    rows = []
    for batch in stub.TrainingData(req):
        rows.extend(batch.rows)
    got = {
        (r.features[0].int64_value, r.label.int64_value) for r in rows
    }
    assert got == {(10, 10), (20, 20)}


def test_grpc_source_data(grpc_serving):
    stub, pb = grpc_serving
    req = pb.SourceDataRequest()
    req.id.name, req.id.version = "events", "default"
    total = sum(len(b.rows) for b in stub.SourceData(req))
    assert total == 2


def test_grpc_train_test_split(grpc_serving):
    stub, pb = grpc_serving

    def reqs():
        init = pb.TrainTestSplitRequest()
        init.id.name, init.id.version = "model", "default"
        init.request_type = pb.RequestType.INITIALIZE
        init.test_size = 0.5
        yield init
        pull = pb.TrainTestSplitRequest()
        pull.id.name = "model"
        pull.request_type = pb.RequestType.TRAINING
        pull.batch_size = 10
        yield pull
        pull2 = pb.TrainTestSplitRequest()
        pull2.id.name = "model"
        pull2.request_type = pb.RequestType.TEST
        pull2.batch_size = 10
        yield pull2

    resps = list(stub.TrainTestSplit(reqs()))
    assert resps[0].initialized
    n_train = len(resps[1].data.rows)
    n_test = len(resps[2].data.rows)
    assert n_train + n_test == 2


def test_grpc_batch_feature_serve(grpc_serving):
    stub, pb = grpc_serving
    req = pb.BatchFeatureServeRequest()
    f = req.features.add()
    f.name, f.version = "clicks", "default"
    rows = []
    for batch in stub.BatchFeatureServe(req):
        rows.extend(batch.rows)
    got = {r.entity.str_value: r.features[0].int64_value for r in rows}
    assert got == {"u1": 10, "u2": 20}


def test_dashboard_endpoints(applied_client):
    dash = DashboardServer(applied_client.metadata, applied_client.coordinator, port=0)
    dash.start()
    base = f"http://127.0.0.1:{dash.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return r.read().decode()

    features = json.loads(get("/data/features"))
    assert {f["name"] for f in features} == {"clicks", "uvec"}
    variants = json.loads(get("/data/features/clicks"))
    assert variants[0]["status"] == "READY"
    tasks = json.loads(get("/tasks"))
    assert all(t["status"] == "READY" for t in tasks)
    health = json.loads(get("/health"))
    assert health["wh"]["healthy"]
    hits = json.loads(get("/search?q=clicks"))
    assert any(h["name"] == "clicks" for h in hits)
    metrics = get("/metrics")
    assert "embeddinghub_tpu" in metrics
    dash.stop()


def test_metrics_render():
    m = MetricsHandler("testns")
    m.feature_served("f", "v", 0.003)
    m.feature_served("f", "v", 0.2)
    m.feature_error("f", "v")
    m.training_rows("ts", "v", 100)
    text = m.render()
    assert 'testns_feature_serve_latency_seconds_count{feature="f",variant="v"} 2' in text
    assert 'testns_feature_serve_errors_total{feature="f",variant="v"} 1' in text
    assert 'testns_training_rows_served_total{trainingset="ts",variant="v"} 100' in text


def test_search_index(applied_client):
    idx = SearchIndex(applied_client.metadata)
    hits = idx.search("uvec")
    assert hits and hits[0]["name"] == "uvec"
    assert idx.search("zzznope") == []


def test_logger_redaction(capsys):
    log = Logger("test-logger").with_fields(password="hunter2")
    new_request_id()
    log.info("hello", token="abc")
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["password"] == "<redacted>" and rec["token"] == "<redacted>"
    assert rec["request_id"]


def test_cli_apply_list_get(tmp_path, capsys):
    from embeddinghub_tpu.featurestore import cli

    reset_provider_cache()
    defs = tmp_path / "defs.py"
    defs.write_text(
        """
import embeddinghub_tpu.featurestore as ff
reg = ff.global_registrar()
reg.register_sqlite_offline("wh")
reg.register_memory_online("cache")
reg.register_entity("user")
reg.register_primary_data("events", provider="wh", location={"rows": [
    {"user_id": "u1", "clicks": 7}]})
reg.register_feature("clicks", source=("events", "default"), entity="user",
                     entity_column="user_id", value_column="clicks",
                     provider="cache")
"""
    )
    db = str(tmp_path / "state.db")
    assert cli.main(["--db", db, "apply", str(defs)]) == 0
    out = capsys.readouterr().out
    # plain status-display lines (non-TTY capture) + created summary
    assert "FEATURE_VARIANT clicks (default): READY" in out
    assert "created FEATURE_VARIANT/clicks/default" in out
    assert cli.main(["--db", db, "list", "feature"]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0].split() == ["NAME", "VARIANT", "STATUS"]
    assert "clicks" in out
    assert cli.main(["--db", db, "get", "feature", "clicks", "default"]) == 0
    out = capsys.readouterr().out
    assert "NAME: " in out and "clicks" in out
    assert "STATUS: " in out and "READY" in out
    assert "SOURCE: " in out  # reference get.py section layout
    assert cli.main(["--db", db, "search", "clicks"]) == 0
    assert "clicks" in capsys.readouterr().out
    # head: first rows of a registered source (reference cli.py:175)
    assert cli.main(["--db", db, "head", "events"]) == 0
    out = capsys.readouterr().out
    assert "user_id" in out and "u1" in out and "7" in out
    assert cli.main(["--db", db, "version"]) == 0
    assert "embeddinghub_tpu" in capsys.readouterr().out


def test_dashboard_serves_static_ui():
    """The dashboard serves a static HTML frontend at / over the same
    JSON API (reference ships a Next.js app; this is the essentials)."""
    import urllib.request

    from embeddinghub_tpu.featurestore.dashboard import DashboardServer
    from embeddinghub_tpu.featurestore.metadata import MetadataStore

    dash = DashboardServer(MetadataStore(), port=0)
    dash.start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{dash.port}/", timeout=5
        ).read().decode()
        assert "<title>embeddinghub-tpu dashboard</title>" in html
        assert "/data/" in html  # the JS drives the JSON API
    finally:
        dash.stop()


def test_metrics_load_generator():
    """Reference parity: test-metrics/main.go traffic shapes."""
    import time as _t

    from embeddinghub_tpu.featurestore.load_generator import (
        MetricsLoadGenerator,
    )
    from embeddinghub_tpu.featurestore.metrics import MetricsHandler

    gen = MetricsLoadGenerator(
        metrics=MetricsHandler(namespace="test"),
        oscillation_period_s=1.0,
    )
    gen.start()
    _t.sleep(0.5)
    gen.stop()
    text = gen.metrics.render()
    assert "Non-free Sulfur Dioxide" in text
    assert "test" in text


def test_grpc_train_test_split_reinit_and_close(grpc_serving):
    """Repeated INITIALIZE resets the split positions (the reference
    swaps in fresh provider iterators, serving.go:182); the stream
    closes once both splits report exhausted (serving.go:133-137)."""
    stub, pb = grpc_serving

    def reqs():
        for _ in range(2):
            init = pb.TrainTestSplitRequest()
            init.id.name, init.id.version = "model", "default"
            init.request_type = pb.RequestType.INITIALIZE
            init.test_size = 0.5
            yield init
            pull = pb.TrainTestSplitRequest()
            pull.id.name = "model"
            pull.request_type = pb.RequestType.TRAINING
            pull.batch_size = 10
            yield pull
        # exhaust both splits -> server closes the stream; further
        # requests after close would error client-side, so stop here
        pull = pb.TrainTestSplitRequest()
        pull.id.name = "model"
        pull.request_type = pb.RequestType.TEST
        pull.batch_size = 10
        yield pull

    resps = list(stub.TrainTestSplit(reqs()))
    assert len(resps) == 5
    assert resps[0].initialized and resps[2].initialized
    # re-INITIALIZE reset the train cursor: same rows served again
    assert len(resps[3].data.rows) == len(resps[1].data.rows)
    assert resps[3].iterator_done and resps[4].iterator_done


def _add_remote_ondemand(client, name="od_score"):
    """Simulate a REMOTELY registered on-demand feature: the variant
    round-trips the wire codec so on_demand_fn degrades to source text
    (never a code object) before it lands in the server's store."""
    from embeddinghub_tpu.featurestore.resources import (
        FeatureVariant,
        from_wire,
        to_wire,
    )

    def od_fn(client_, params, entities):
        return len(str(entities.get("user", ""))) * 100

    fv = FeatureVariant(
        name=name, variant="default", on_demand_fn=od_fn, owner="alice"
    )
    remote_fv = from_wire(to_wire(fv))
    assert isinstance(remote_fv.on_demand_fn, str)  # source text on wire
    client.metadata.create(remote_fv)
    return remote_fv


def test_grpc_on_demand_registered_callable(grpc_serving, applied_client):
    """Server-side on-demand execution for remote clients (reference
    serving/serving.go dill path) WITHOUT executing client bytes: the
    operator registers a native callable and FeatureServe answers with
    it."""
    from embeddinghub_tpu.featurestore.serving import register_on_demand

    stub, pb = grpc_serving
    _add_remote_ondemand(applied_client)
    register_on_demand(
        "od_score", lambda c, p, ents: 42 + len(ents.get("user", ""))
    )
    try:
        req = pb.FeatureServeRequest()
        f = req.features.add()
        f.name, f.version = "od_score", "default"
        e = req.entities.add()
        e.name = "user"
        e.values.append("u2")
        row = stub.FeatureServe(req)
        assert row.value_lists[0].values[0].int64_value == 44
    finally:
        from embeddinghub_tpu.featurestore import serving as serving_mod

        serving_mod._ON_DEMAND_REGISTRY.clear()


def test_grpc_on_demand_source_fails_closed(grpc_serving, applied_client, monkeypatch):
    """Without a registered callable and without the opt-in env var,
    remotely shipped on-demand source must NOT execute."""
    import grpc as grpc_mod

    stub, pb = grpc_serving
    _add_remote_ondemand(applied_client, name="od_closed")
    monkeypatch.delenv("EHTPU_ALLOW_REMOTE_CODE", raising=False)
    req = pb.FeatureServeRequest()
    f = req.features.add()
    f.name, f.version = "od_closed", "default"
    e = req.entities.add()
    e.name = "user"
    e.values.append("u1")
    with pytest.raises(grpc_mod.RpcError):
        stub.FeatureServe(req)


def test_grpc_on_demand_source_opt_in(grpc_serving, applied_client, monkeypatch):
    """With EHTPU_ALLOW_REMOTE_CODE=1 the shipped source executes
    server-side (the reference's always-on dill behavior, made opt-in)."""
    stub, pb = grpc_serving
    _add_remote_ondemand(applied_client, name="od_open")
    monkeypatch.setenv("EHTPU_ALLOW_REMOTE_CODE", "1")
    req = pb.FeatureServeRequest()
    f = req.features.add()
    f.name, f.version = "od_open", "default"
    e = req.entities.add()
    e.name = "user"
    e.values.append("u1")
    row = stub.FeatureServe(req)
    assert row.value_lists[0].values[0].int64_value == 200  # len("u1")*100


def test_dashboard_drilldown_lineage_diff(applied_client):
    """Task-run drill-down, lineage graph, and variant field-diff
    endpoints (the reference dashboard's task detail + DAG views,
    metadata/dashboard/dashboard_metadata.go)."""
    dash = DashboardServer(
        applied_client.metadata, applied_client.coordinator, port=0
    )
    dash.start()
    base = f"http://127.0.0.1:{dash.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return json.loads(r.read().decode())

    try:
        runs = get("/tasks")
        assert runs and all("duration_s" in r for r in runs)
        rid = runs[0]["run_id"]
        detail = get(f"/tasks/{rid}")
        assert detail["run_id"] == rid
        assert "logs" in detail and "task_runs" in detail
        assert detail["started_at"] is not None

        g = get("/lineage/training-sets/model/default")
        ids = {n["id"] for n in g["nodes"]}
        # upstream: label + feature + their source
        assert g["root"].startswith("TRAINING_SET_VARIANT/model")
        assert any("LABEL_VARIANT/clicked" in i for i in ids)
        assert any("SOURCE_VARIANT/events" in i for i in ids)
        assert g["edges"], "training set must have upstream edges"
        # feature lineage flows downstream to the training set
        gf = get("/lineage/features/clicks/default")
        assert any("TRAINING_SET_VARIANT/model" in i
                   for n in gf["nodes"] for i in [n["id"]])
        # nodes carry their latest run status
        assert any(n["latest_run"] for n in g["nodes"])

        # field-level variant diff
        reg = applied_client.registrar
        reg.register_primary_data(
            "events", variant="v2", provider="wh",
            location={"rows": ROWS + [{"user_id": "u3", "clicks": 5,
                                       "vec": [1.0, 1.0], "ts": 2}]},
        )
        applied_client.apply()
        diff = get("/diff/sources/events?v1=default&v2=v2")
        assert "primary" in diff["differing_fields"]
    finally:
        dash.stop()


def test_status_displayer_plain_and_verbose(applied_client, capsys):
    """StatusDisplayer (reference status_display.py:47): plain mode
    prints one line per status change; verbose raises on FAILED."""
    import io

    from embeddinghub_tpu.featurestore.resources import (
        ResourceID, ResourceType, Status,
    )
    from embeddinghub_tpu.featurestore.status_display import StatusDisplayer

    meta = applied_client.metadata
    resources = [
        meta.get(ResourceID(ResourceType.FEATURE_VARIANT, "clicks", "default")),
        meta.get(ResourceID(ResourceType.SOURCE_VARIANT, "events", "default")),
    ]
    buf = io.StringIO()
    disp = StatusDisplayer(meta, resources, plain=True, out=buf)
    disp.display()  # everything already READY -> returns immediately
    out = buf.getvalue()
    assert "FEATURE_VARIANT clicks (default): READY" in out
    assert "SOURCE_VARIANT events (default): READY" in out

    # verbose mode raises when a tracked resource FAILED
    rid = ResourceID(ResourceType.FEATURE_VARIANT, "clicks", "default")
    meta.set_status(rid, Status.FAILED, "boom")
    disp2 = StatusDisplayer(
        meta, [meta.get(rid)], plain=True, verbose=True, out=io.StringIO()
    )
    with pytest.raises(Exception, match="failed to create"):
        disp2.display()
    meta.set_status(rid, Status.READY)


def test_apply_with_display(capsys):
    """client.apply(display=True) drives the coordinator while the
    status table tracks resources to READY."""
    reset_provider_cache()
    ff.global_registrar().reset()
    client = ff.Client()
    reg = client.registrar
    reg.register_sqlite_offline("wh2")
    reg.register_memory_online("cache2")
    reg.register_entity("user")
    reg.register_primary_data(
        "ev2", provider="wh2",
        location={"rows": [{"user_id": "u1", "n": 1}]},
    )
    reg.register_feature(
        "n", source=("ev2", "default"), entity="user",
        entity_column="user_id", value_column="n", provider="cache2",
    )
    created = client.apply(display=True)
    assert any(r.name == "n" for r in created)
    out = capsys.readouterr().out
    assert "FEATURE_VARIANT n (default): READY" in out
    vals = client.features([("n", "default")], {"user": "u1"})
    assert vals == [1]


def test_cli_deploy_lifecycle(tmp_path, monkeypatch):
    """`deploy start/status/stop` boots and tears down the composed
    single-process stack (the reference's `featureform deploy`
    quickstart, deploy.py, docker replaced by a pid-filed child)."""
    import os
    import random
    import sys

    from embeddinghub_tpu.featurestore import cli

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
    monkeypatch.setenv(
        "PYTHONPATH", REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    ports = [str(random.randint(20000, 40000)) for _ in range(4)]
    argv = [
        "deploy", "start",
        "--store-port", ports[0], "--serving-port", ports[1],
        "--metadata-port", ports[2], "--http-port", ports[3],
        "--data-dir", str(tmp_path / "store"),
        "--pid-file", str(tmp_path / "pid"),
        "--wait", "90",
    ]
    assert cli.main(argv) == 0
    try:
        assert cli.main(
            ["deploy", "status", "--http-port", ports[3],
             "--pid-file", str(tmp_path / "pid")]
        ) == 0
        # double-start refuses
        assert cli.main(argv) == 1
    finally:
        assert cli.main(
            ["deploy", "stop", "--pid-file", str(tmp_path / "pid")]
        ) == 0
    assert cli.main(
        ["deploy", "status", "--http-port", ports[3],
         "--pid-file", str(tmp_path / "pid")]
    ) == 1


def test_dashboard_ui_routes(applied_client):
    """The static UI's drill-down routes (VERDICT r3 item 9): metrics
    snapshot + sparkline feed, lineage graph, field-level variant diff,
    and task-run drill-down — each through the HTTP surface the page's
    JS actually calls, plus the page advertising those views."""
    from embeddinghub_tpu.featurestore.metrics import METRICS

    # a second, *differing* source variant so the diff has content
    applied_client.registrar.register_primary_data(
        "events", provider="wh", variant="v2",
        location={"rows": ROWS + [{"user_id": "u3", "clicks": 1,
                                   "vec": [0.5, 0.5], "ts": 2}]})
    applied_client.apply()
    METRICS.feature_served("clicks", "default", 0.004)

    dash = DashboardServer(
        applied_client.metadata, applied_client.coordinator, port=0)
    dash.start()
    base = f"http://127.0.0.1:{dash.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return r.read().decode()

    try:
        # page advertises the new views (filter bar, metrics, diff)
        html = get("/")
        for needle in ("renderMetrics", "showDiff", "renderList",
                       "data-view=\"metrics\""):
            assert needle in html, needle

        snap = json.loads(get("/metrics.json"))
        assert {"serve", "errors", "training_rows", "counters"} <= set(snap)
        assert any(s["feature"] == "clicks" and s["count"] >= 1
                   for s in snap["serve"])

        lin = json.loads(get("/lineage/features/clicks/default"))
        ids = {n["id"] for n in lin["nodes"]}
        assert any("events" in i for i in ids)      # upstream source
        assert lin["edges"], "lineage must have edges"

        diff = json.loads(get("/diff/sources/events?v1=default&v2=v2"))
        assert diff["differing_fields"], "v2 adds a row -> fields differ"

        runs = json.loads(get("/tasks"))
        detail = json.loads(get(f"/tasks/{runs[0]['run_id']}"))
        assert detail["run_id"] == runs[0]["run_id"]
        assert "task_runs" in detail and detail["task_runs"]
    finally:
        dash.stop()
