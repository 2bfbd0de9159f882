"""Edge-case coverage: hub engine validation, version multiget, offline
index error paths, dashboard 404s, sqlite offline error paths."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore import fferr
from embeddinghub_tpu.featurestore.dashboard import DashboardServer
from embeddinghub_tpu.featurestore.providers.base import reset_provider_cache
from embeddinghub_tpu.featurestore.providers.sqlite_offline import (
    SqliteOfflineStore,
)
from embeddinghub_tpu.sdk.offline import Index
from embeddinghub_tpu.store import EmbeddingHub, KeyNotFoundError


def test_hub_unknown_engine():
    hub = EmbeddingHub.in_memory(engine="warp-drive")
    with pytest.raises(ValueError):
        hub.create_space("s", dims=4)


def test_version_multiget_missing_key():
    hub = EmbeddingHub.in_memory()
    hub.create_space("s", dims=2)
    v = hub.get_version("s")
    v.set("a", [1, 1])
    with pytest.raises(KeyNotFoundError):
        v.multiget(["a", "ghost"])


def test_offline_index_empty_nn():
    idx = Index([], dims=3)
    assert idx.nearest_neighbor(3, embedding=[0.0, 0.0, 0.0]) == []


def test_offline_index_keyed_missing():
    idx = Index([("a", [1.0, 2.0])], dims=2)
    with pytest.raises(KeyError):
        idx.nearest_neighbor(1, key="ghost")


def test_sqlite_offline_missing_table():
    store = SqliteOfflineStore({})
    with pytest.raises(fferr.ResourceNotFoundError):
        store.table_rows("nope", "default")


def test_sqlite_offline_bad_transformation():
    store = SqliteOfflineStore({})
    with pytest.raises(fferr.InvalidResourceError):
        store.create_transformation("t", "default", {"magic": 1}, [])


def test_sqlite_materialize_missing_columns():
    store = SqliteOfflineStore({})
    store.write_rows("src", "default", [{"a": 1}])
    with pytest.raises(fferr.InvalidResourceError):
        store.materialize("src", "default", "user_id", "value")


def test_dashboard_404s():
    reset_provider_cache()
    ff.global_registrar().reset()
    client = ff.Client()
    dash = DashboardServer(client.metadata, client.coordinator, port=0)
    dash.start()
    base = f"http://127.0.0.1:{dash.port}"
    for path in ("/data/plutonium", "/nope"):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + path, timeout=10)
        assert e.value.code == 404
    # empty listing is a 200 with []
    with urllib.request.urlopen(base + "/data/features", timeout=10) as r:
        assert json.loads(r.read().decode()) == []
    dash.stop()


def test_engine_vector_store_scalar_table_rejected():
    from embeddinghub_tpu.featurestore.providers.engine_vector import (
        EngineVectorStore,
    )

    store = EngineVectorStore({})
    with pytest.raises(fferr.ProviderTypeError):
        store.create_table("f", "default")
    table = store.create_index("f", "default", 4)
    table.batch_set([("e1", [1, 0, 0, 0])])
    assert store.get_table("f", "default").get("e1") == [1, 0, 0, 0]
    store.delete_index("f", "default")
    with pytest.raises(fferr.ResourceNotFoundError):
        store.get_table("f", "default")
