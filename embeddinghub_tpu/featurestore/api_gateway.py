"""API gateway: a transparent gRPC proxy with request-id forwarding.

The reference fronts its control plane with an ``ApiServer`` that
proxies resource CRUD to the metadata service and serving calls to the
feature server, attaching a request ID to every hop for cross-service
log correlation (``api/api.go:44-67``, interceptor ``api.go:86-99``).

This is the TPU build's analog, generalized: a *byte-level* gRPC proxy
— method routes and streaming arities come from the protobuf service
descriptors, and payloads are forwarded verbatim (no re-serialization),
so one gateway class fronts the compact metadata service, the
wire-parity metadata service, the serving service and the embedding
store alike.  Each call:

  * reuses the caller's ``x-request-id`` metadata or mints one,
  * binds it to the logging contextvar for the proxy's own access log,
  * forwards it to the backend so its logs correlate.
"""

from __future__ import annotations

import time
from concurrent import futures as cf

import grpc

from embeddinghub_tpu.featurestore import logging as fflog

_RID_KEY = "x-request-id"


def _methods_of(pb2_module):
    """(full_method_path, client_streaming, server_streaming) triples
    for every service in a generated pb2 module."""
    out = []
    for svc in pb2_module.DESCRIPTOR.services_by_name.values():
        for m in svc.methods:
            out.append((
                f"/{svc.full_name}/{m.name}",
                bool(m.client_streaming),
                bool(m.server_streaming),
            ))
    return out


class _ProxyHandler(grpc.GenericRpcHandler):
    def __init__(self, channel: grpc.Channel, pb2_modules, logger=None):
        self._log = logger or fflog.Logger("api-gateway")
        self._routes = {}
        for mod in pb2_modules:
            for path, cs, ss in _methods_of(mod):
                self._routes[path] = self._make(channel, path, cs, ss)

    def _make(self, channel, path, client_streaming, server_streaming):
        ident = lambda b: b  # noqa: E731 — bytes in, bytes out

        if not client_streaming and not server_streaming:
            call = channel.unary_unary(path)

            def handler(request, context, _call=call, _path=path):
                return self._forward_unary(_call, _path, request, context)

            return grpc.unary_unary_rpc_method_handler(
                handler, request_deserializer=ident,
                response_serializer=ident,
            )
        if not client_streaming and server_streaming:
            call = channel.unary_stream(path)

            def handler(request, context, _call=call, _path=path):
                yield from self._forward_stream(
                    lambda md: _call(request, metadata=md), _path, context
                )

            return grpc.unary_stream_rpc_method_handler(
                handler, request_deserializer=ident,
                response_serializer=ident,
            )
        if client_streaming and not server_streaming:
            call = channel.stream_unary(path)

            def handler(request_iterator, context, _call=call, _path=path):
                return self._forward_unary(
                    _call, _path, request_iterator, context
                )

            return grpc.stream_unary_rpc_method_handler(
                handler, request_deserializer=ident,
                response_serializer=ident,
            )
        call = channel.stream_stream(path)

        def handler(request_iterator, context, _call=call, _path=path):
            yield from self._forward_stream(
                lambda md: _call(request_iterator, metadata=md),
                _path, context,
            )

        return grpc.stream_stream_rpc_method_handler(
            handler, request_deserializer=ident, response_serializer=ident,
        )

    # ------------------------------------------------------------ forwarding

    @staticmethod
    def _request_id(context) -> str:
        for k, v in context.invocation_metadata() or ():
            if k.lower() == _RID_KEY:
                return v
        return fflog.new_request_id()

    def _forward_unary(self, call, path, payload, context):
        rid = self._request_id(context)
        fflog.set_request_id(rid)
        t0 = time.perf_counter()
        try:
            resp = call(payload, metadata=((_RID_KEY, rid),))
            self._log.info(
                "proxied", method=path,
                ms=round((time.perf_counter() - t0) * 1e3, 2),
            )
            return resp
        except grpc.RpcError as e:  # propagate backend status verbatim
            self._log.warning("proxy_error", method=path,
                              code=str(e.code()), detail=e.details())
            context.abort(e.code(), e.details())

    def _forward_stream(self, start, path, context):
        rid = self._request_id(context)
        fflog.set_request_id(rid)
        t0 = time.perf_counter()
        try:
            yield from start(((_RID_KEY, rid),))
            self._log.info(
                "proxied", method=path,
                ms=round((time.perf_counter() - t0) * 1e3, 2),
            )
        except grpc.RpcError as e:
            self._log.warning("proxy_error", method=path,
                              code=str(e.code()), detail=e.details())
            context.abort(e.code(), e.details())

    # ---------------------------------------------------------------- grpc

    def service(self, handler_call_details):
        return self._routes.get(handler_call_details.method)


def build_gateway(
    backends: list[tuple[str, list]],
    *,
    max_workers: int = 16,
) -> grpc.Server:
    """Build (not start) a gateway server.

    ``backends``: list of ``(target_address, [pb2_modules...])`` — each
    backend address serves the services described by its pb2 modules.
    """
    server = grpc.server(cf.ThreadPoolExecutor(max_workers=max_workers))
    for target, mods in backends:
        channel = grpc.insecure_channel(target)
        server.add_generic_rpc_handlers((_ProxyHandler(channel, mods),))
    return server
