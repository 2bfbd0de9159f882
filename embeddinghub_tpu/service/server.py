"""EmbeddingHub gRPC server.

Wire-compatible rebuild of reference ``embeddingstore/server.{h,cc}`` +
``main.cc``: same 9 RPCs, same status-code behavior (spaces implicitly
use version "initial", ``server.cc:48``; NearestNeighbor key-XOR-vector
validation and keyed self-exclusion, ``server.cc:182-207``; immutable
writes -> FAILED_PRECONDITION "Cannot write to immutable space").

Concurrency model is the deliberate departure: instead of one global
mutex serializing every RPC (``server.h:65``), reads/writes take a
per-version lock and NearestNeighbor traffic funnels through a
:class:`QueryBatcher` that fuses concurrent queries into single batched
TPU dispatches.

Run:  python -m embeddinghub_tpu.service.server [host:port]
Default listen address matches the reference: 0.0.0.0:7462 (main.cc:8);
data dir "embedding_store.dat" (server.cc:250).
"""

from __future__ import annotations

import sys
import threading
from concurrent import futures as cf

import grpc
import numpy as np

from embeddinghub_tpu.service.batcher import QueryBatcher
from embeddinghub_tpu.service.proto import embedding_store_pb2 as pb
from embeddinghub_tpu.service.proto import embedding_store_pb2_grpc as pb_grpc
from embeddinghub_tpu.store import EmbeddingHub, errors as store_errors
from embeddinghub_tpu.store.space import DEFAULT_VERSION
from embeddinghub_tpu.utils.config import get_config

_CODE_MAP = {
    "NOT_FOUND": grpc.StatusCode.NOT_FOUND,
    "ALREADY_EXISTS": grpc.StatusCode.ALREADY_EXISTS,
    "FAILED_PRECONDITION": grpc.StatusCode.FAILED_PRECONDITION,
    "INVALID_ARGUMENT": grpc.StatusCode.INVALID_ARGUMENT,
    "INTERNAL": grpc.StatusCode.INTERNAL,
}

_MULTISET_FLUSH = 4096  # records buffered per space before a batched index add


class EmbeddingHubService(pb_grpc.EmbeddingHubServicer):
    def __init__(self, store: EmbeddingHub, config=None):
        self._store = store
        self._config = config or get_config()
        self._batcher = QueryBatcher(
            window_ms=self._config.query_batch_window_ms,
            max_batch=self._config.max_query_batch,
        )
    # ------------------------------------------------------------- plumbing

    def _lock_for(self, version) -> threading.RLock:
        return version.lock

    def _version(self, space: str, context):
        version = self._store.get_version(space, DEFAULT_VERSION)
        if version is None:
            context.abort(grpc.StatusCode.NOT_FOUND, "Not found")
        return version

    def _abort_store_error(self, context, err: store_errors.EmbeddingHubError):
        if isinstance(err, store_errors.ImmutableVersionError):
            context.abort(
                grpc.StatusCode.FAILED_PRECONDITION,
                "Cannot write to immutable space",
            )
        context.abort(_CODE_MAP.get(err.grpc_code, grpc.StatusCode.INTERNAL), str(err))

    # --------------------------------------------------------------- spaces

    def CreateSpace(self, request, context):
        metric = self._config.default_metric
        self._store.create_space(request.name, request.dims, metric)
        return pb.CreateSpaceResponse()

    def DeleteSpace(self, request, context):
        self._store.delete_space(request.name)
        return pb.DeleteSpaceResponse()

    def FreezeSpace(self, request, context):
        version = self._version(request.name, context)
        with self._lock_for(version):
            version.make_immutable()
        return pb.FreezeSpaceResponse()

    # ---------------------------------------------------------------- writes

    def Set(self, request, context):
        version = self._version(request.space, context)
        try:
            with self._lock_for(version):
                version.set(request.key, list(request.embedding.values))
        except store_errors.EmbeddingHubError as e:
            self._abort_store_error(context, e)
        return pb.SetResponse()

    def MultiSet(self, request_iterator, context):
        # Buffer per-space and flush as batched index adds: one device
        # scatter per few thousand records instead of per record.
        buffers: dict[str, list[tuple[str, list[float]]]] = {}
        try:
            for request in request_iterator:
                version = self._version(request.space, context)
                buf = buffers.setdefault(request.space, [])
                buf.append((request.key, list(request.embedding.values)))
                if len(buf) >= _MULTISET_FLUSH:
                    with self._lock_for(version):
                        version.multiset(buf)
                    buf.clear()
            for space, buf in buffers.items():
                if buf:
                    version = self._version(space, context)
                    with self._lock_for(version):
                        version.multiset(buf)
        except store_errors.EmbeddingHubError as e:
            self._abort_store_error(context, e)
        return pb.MultiSetResponse()

    # ----------------------------------------------------------------- reads

    def Get(self, request, context):
        version = self._version(request.space, context)
        try:
            vec = version.get(request.key)
        except store_errors.EmbeddingHubError as e:
            self._abort_store_error(context, e)
        resp = pb.GetResponse()
        resp.embedding.values[:] = vec.tolist()
        return resp

    def MultiGet(self, request_iterator, context):
        for request in request_iterator:
            version = self._version(request.space, context)
            try:
                vec = version.get(request.key)
            except store_errors.EmbeddingHubError as e:
                self._abort_store_error(context, e)
            resp = pb.MultiGetResponse()
            resp.embedding.values[:] = vec.tolist()
            yield resp

    def Download(self, request, context):
        version = self._version(request.space, context)
        for key, vec in version.iterator():
            resp = pb.DownloadResponse()
            resp.key = key
            resp.embedding.values[:] = vec.tolist()
            yield resp

    # --------------------------------------------------------------- nearest

    def NearestNeighbor(self, request, context):
        version = self._version(request.space, context)
        has_key = request.key != ""
        has_vec = len(request.embedding.values) != 0
        if has_key and has_vec:
            context.abort(
                grpc.StatusCode.INVALID_ARGUMENT,
                "Key and embedding cannot both be set",
            )
        if not has_key and not has_vec:
            context.abort(
                grpc.StatusCode.INVALID_ARGUMENT, "Key or embedding must be set"
            )
        num = request.num
        try:
            if has_key:
                vector = version.get(request.key)
                fetch = num + 1
            else:
                vector = np.asarray(list(request.embedding.values), np.float32)
                if vector.shape[0] != version.dims:
                    raise store_errors.DimensionMismatchError(
                        version.dims, vector.shape[0]
                    )
                fetch = num
            keys = self._batcher.submit(version, vector, fetch).result()
        except store_errors.EmbeddingHubError as e:
            self._abort_store_error(context, e)
        if has_key:
            keys = list(keys)
            if request.key in keys:
                keys.remove(request.key)
            elif len(keys) > num:
                keys.pop()
        resp = pb.NearestNeighborResponse()
        resp.keys[:] = list(keys)
        return resp

    def BatchNearestNeighbor(self, request, context):
        """Extension RPC: a whole query batch in one round trip, executed
        as one fused device dispatch (the through-the-wire analog of the
        QueryBatcher's fusion for single-query RPC streams)."""
        version = self._version(request.space, context)
        has_keys = len(request.keys) > 0
        has_vecs = len(request.embeddings) > 0
        if has_keys == has_vecs:
            context.abort(
                grpc.StatusCode.INVALID_ARGUMENT,
                "Exactly one of keys or embeddings must be set",
            )
        num = request.num
        try:
            if has_keys:
                queries = np.stack([version.get(k) for k in request.keys])
                fetch = num + 1
            else:
                queries = np.asarray(
                    [list(e.values) for e in request.embeddings], np.float32
                )
                if queries.ndim != 2 or queries.shape[1] != version.dims:
                    raise store_errors.DimensionMismatchError(
                        version.dims, queries.shape[-1] if queries.ndim else 0
                    )
                fetch = num
            with self._lock_for(version):
                results = version.nearest_batch(queries, fetch)
        except store_errors.EmbeddingHubError as e:
            self._abort_store_error(context, e)
        resp = pb.BatchNearestNeighborResponse()
        for i, keys in enumerate(results):
            keys = list(keys)
            if has_keys:
                me = request.keys[i]
                if me in keys:
                    keys.remove(me)
                elif len(keys) > num:
                    keys.pop()
            resp.results.add().keys[:] = keys
        return resp

    def stop(self) -> None:
        self._batcher.stop()


def build_server(
    address: str,
    data_dir: str | None = None,
    config=None,
    max_workers: int = 32,
) -> tuple[grpc.Server, EmbeddingHubService]:
    config = config or get_config()
    store = (
        EmbeddingHub.load_or_create(data_dir, engine=config.engine)
        if data_dir
        else EmbeddingHub.in_memory(engine=config.engine)
    )
    service = EmbeddingHubService(store, config)
    from embeddinghub_tpu.featurestore.interceptors import make_server

    server = make_server(cf.ThreadPoolExecutor(max_workers=max_workers))
    pb_grpc.add_EmbeddingHubServicer_to_server(service, server)
    try:
        from grpc_health.v1 import health, health_pb2_grpc

        health_pb2_grpc.add_HealthServicer_to_server(health.HealthServicer(), server)
    except ImportError:
        pass  # health service optional (reference enables it, server.cc:255)
    from embeddinghub_tpu.utils.channels import add_server_port

    add_server_port(server, address)
    return server, service


def run_server(address: str, data_dir: str | None = "embedding_store.dat") -> None:
    server, service = build_server(address, data_dir)
    server.start()
    print(f"Server listening on {address}", flush=True)
    try:
        server.wait_for_termination()
    finally:
        service.stop()


def main(argv: list[str] | None = None) -> None:
    import argparse

    cfg = get_config()
    ap = argparse.ArgumentParser(
        prog="embeddinghub_tpu.service.server",
        description="EmbeddingHub gRPC server (reference main.cc parity: "
        "positional listen address, default 0.0.0.0:7462).",
    )
    ap.add_argument("address", nargs="?", default=f"{cfg.host}:{cfg.port}")
    ap.add_argument("data_dir_pos", nargs="?", default=None,
                    help="data directory (positional, reference style)")
    ap.add_argument("--data-dir", dest="data_dir", default=None)
    ns = ap.parse_args(argv if argv is not None else sys.argv[1:])
    run_server(ns.address, ns.data_dir or ns.data_dir_pos or cfg.data_dir)


if __name__ == "__main__":
    main()
