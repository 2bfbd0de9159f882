"""Uniform server interceptor (reference helpers/interceptors
interceptors.go:20-35 + api.go:86-99 request-id logging): uncaught
FFError leaves as its declared status; unexpected exceptions become
INTERNAL; x-request-id is honored/minted and returned as trailing
metadata."""

import concurrent.futures as cf

import grpc
import pytest

from embeddinghub_tpu.featurestore import fferr
from embeddinghub_tpu.featurestore.interceptors import make_server
from embeddinghub_tpu.featurestore.logging import request_id


def _echo_handler():
    def unary(request, context):
        if request == b"ffer":
            raise fferr.ResourceNotFoundError("FEATURE", "missing")
        if request == b"boom":
            raise RuntimeError("kaput")
        if request == b"abort":
            context.abort(grpc.StatusCode.PERMISSION_DENIED, "no")
        if request == b"rid":
            return request_id().encode()
        return request

    def stream(request, context):
        yield b"a"
        if request == b"mid-ffer":
            raise fferr.KeyAlreadyLockedError("k", "owner")
        yield b"b"

    ident = lambda b: b  # noqa: E731
    return grpc.method_handlers_generic_handler(
        "test.Echo",
        {
            "Call": grpc.unary_unary_rpc_method_handler(
                unary, request_deserializer=ident, response_serializer=ident
            ),
            "Stream": grpc.unary_stream_rpc_method_handler(
                stream, request_deserializer=ident, response_serializer=ident
            ),
        },
    )


@pytest.fixture(scope="module")
def chan():
    server = make_server(cf.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((_echo_handler(),))
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    yield channel
    channel.close()
    server.stop(0)


def _call(chan):
    ident = lambda b: b  # noqa: E731
    return chan.unary_unary("/test.Echo/Call", request_serializer=ident,
                            response_deserializer=ident)


def test_ok_and_request_id_roundtrip(chan):
    call = _call(chan)
    assert call(b"hi") == b"hi"
    # client-supplied request id binds to the logging contextvar
    assert call(b"rid", metadata=[("x-request-id", "req-42")]) == b"req-42"
    # minted when absent, surfaced in trailing metadata
    resp, call_obj = _call(chan).with_call(b"rid")
    trailers = dict(call_obj.trailing_metadata() or ())
    assert resp.decode() == trailers.get("x-request-id") != ""


def test_fferr_maps_to_declared_status(chan):
    with pytest.raises(grpc.RpcError) as e:
        _call(chan)(b"ffer")
    assert e.value.code() == grpc.StatusCode.NOT_FOUND
    assert "missing" in e.value.details()


def test_unexpected_exception_becomes_internal(chan):
    with pytest.raises(grpc.RpcError) as e:
        _call(chan)(b"boom")
    assert e.value.code() == grpc.StatusCode.INTERNAL
    assert "RuntimeError" in e.value.details()


def test_explicit_abort_passes_through(chan):
    with pytest.raises(grpc.RpcError) as e:
        _call(chan)(b"abort")
    assert e.value.code() == grpc.StatusCode.PERMISSION_DENIED
    assert e.value.details() == "no"


def test_stream_midflight_fferr(chan):
    ident = lambda b: b  # noqa: E731
    stream = chan.unary_stream("/test.Echo/Stream", request_serializer=ident,
                               response_deserializer=ident)
    got = []
    with pytest.raises(grpc.RpcError) as e:
        for item in stream(b"mid-ffer"):
            got.append(item)
    assert got == [b"a"]
    assert e.value.code() == grpc.StatusCode.ABORTED
