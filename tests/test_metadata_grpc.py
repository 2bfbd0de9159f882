"""Metadata gRPC service + remote apply end-to-end."""

import grpc
import pytest

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore.metadata_grpc import (
    RemoteMetadataClient,
    build_server,
)
from embeddinghub_tpu.featurestore.providers.base import reset_provider_cache
from embeddinghub_tpu.featurestore.registry import Registrar
from embeddinghub_tpu.featurestore.resources import ResourceType, Status


@pytest.fixture
def remote():
    reset_provider_cache()
    ff.global_registrar().reset()
    backend = ff.Client()
    server = build_server("127.0.0.1:0", backend.metadata, backend.coordinator)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    client = RemoteMetadataClient(port=port)
    yield client, backend
    client.close()
    server.stop(0)


def test_remote_apply_and_get(remote):
    client, backend = remote
    reg = Registrar()
    reg.register_sqlite_offline("wh")
    reg.register_memory_online("cache")
    reg.register_entity("user")
    reg.register_primary_data(
        "events",
        provider="wh",
        location={"rows": [{"user_id": "u1", "clicks": 3}]},
    )
    reg.register_feature(
        "clicks",
        source=("events", "default"),
        entity="user",
        entity_column="user_id",
        value_column="clicks",
        provider="cache",
    )
    created = client.apply(reg)
    assert created == 5
    feat = client.get(ResourceType.FEATURE_VARIANT, "clicks", "default")
    assert feat.status == Status.READY
    # serve through the backend (the coordinator actually materialized)
    assert backend.features(["clicks"], {"user": "u1"}) == [3]


def test_remote_list_search_delete(remote):
    client, _ = remote
    reg = Registrar()
    reg.register_entity("product")
    reg.register_user("carol")
    client.apply(reg)
    assert [u.name for u in client.list(ResourceType.USER)] == ["carol"]
    hits = client.search("carol")
    assert any(h["name"] == "carol" for h in hits)
    client.delete(ResourceType.USER, "carol")
    assert client.list(ResourceType.USER) == []


def test_remote_get_missing(remote):
    client, _ = remote
    with pytest.raises(grpc.RpcError) as e:
        client.get(ResourceType.ENTITY, "ghost")
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_remote_conflicting_variant(remote):
    client, _ = remote
    reg = Registrar()
    reg.register_sqlite_offline("wh2")
    reg.register_primary_data(
        "src", provider="wh2", location={"rows": [{"a": 1}]}
    )
    client.apply(reg)
    reg2 = Registrar()
    reg2.register_primary_data(
        "src", provider="wh2", location={"rows": [{"a": 2}]}
    )
    with pytest.raises(grpc.RpcError) as e:
        client.apply(reg2)
    assert e.value.code() == grpc.StatusCode.FAILED_PRECONDITION
