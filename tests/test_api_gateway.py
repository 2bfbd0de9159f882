"""API gateway: transparent byte-level proxy with request-id
forwarding (reference ApiServer + interceptor, api/api.go:44-99)."""

import threading

import grpc
import pytest

from embeddinghub_tpu.featurestore.api_gateway import build_gateway
from embeddinghub_tpu.featurestore.metadata import MetadataStore
from embeddinghub_tpu.featurestore.metadata_grpc import (
    RemoteMetadataClient,
    build_server,
)
from embeddinghub_tpu.featurestore.proto import metadata_pb2
from embeddinghub_tpu.featurestore.resources import Entity, ResourceType, User


class _MetaCapture(grpc.ServerInterceptor):
    """Record the x-request-id metadata the backend receives."""

    def __init__(self):
        self.rids = []
        self._lock = threading.Lock()

    def intercept_service(self, continuation, handler_call_details):
        rid = dict(handler_call_details.invocation_metadata).get(
            "x-request-id"
        )
        with self._lock:
            self.rids.append(rid)
        return continuation(handler_call_details)


@pytest.fixture()
def stack():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    bport = s.getsockname()[1]
    s.close()

    cap = _MetaCapture()
    store = MetadataStore()
    backend = build_server(
        f"127.0.0.1:{bport}", store, interceptors=[cap]
    )
    backend.start()

    gateway = build_gateway(
        [(f"127.0.0.1:{bport}", [metadata_pb2])]
    )
    gport = gateway.add_insecure_port("127.0.0.1:0")
    gateway.start()
    try:
        yield cap, gport
    finally:
        gateway.stop(None)
        backend.stop(None)


def test_proxied_crud_and_request_id(stack):
    cap, gport = stack
    client = RemoteMetadataClient("127.0.0.1", gport)
    client.create(User(name="alice"))
    client.create(Entity(name="user"))
    got = client.get(ResourceType.USER, "alice")
    assert got.name == "alice"
    names = [r.name for r in client.list(ResourceType.ENTITY)]
    assert "user" in names
    # every backend call carried a gateway-minted request id
    assert cap.rids and all(r for r in cap.rids)


def test_caller_request_id_is_forwarded(stack):
    cap, gport = stack
    chan = grpc.insecure_channel(f"127.0.0.1:{gport}")
    from embeddinghub_tpu.featurestore.proto import metadata_pb2_grpc

    stub = metadata_pb2_grpc.MetadataStub(chan)
    list(stub.ListResources(
        metadata_pb2.TypeRef(type="USER"),
        metadata=(("x-request-id", "rid-from-caller"),),
    ))
    assert "rid-from-caller" in cap.rids


def test_backend_errors_propagate(stack):
    _, gport = stack
    client = RemoteMetadataClient("127.0.0.1", gport)
    with pytest.raises(Exception) as ei:
        client.get(ResourceType.USER, "missing")
    assert "NOT_FOUND" in str(ei.value) or "not found" in str(ei.value).lower()
