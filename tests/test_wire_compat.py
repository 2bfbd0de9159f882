"""Wire-compatibility proof: drive OUR server with message classes
generated from the REFERENCE's own proto file.

The reference proto is compiled (protoc --python_out) from
/root/reference/embeddinghub/embeddingstore/embedding_store.proto into a
separate module namespace, and a raw gRPC stub built on those classes
talks to this package's server — byte-level compatibility, not just
same-shaped APIs.  Skipped when the reference tree or protoc is absent.
"""

import os
import shutil
import subprocess
import sys

import grpc
import pytest

REF_PROTO = "/root/reference/embeddinghub/embeddingstore/embedding_store.proto"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_PROTO) and shutil.which("protoc")),
    reason="reference proto or protoc unavailable",
)


@pytest.fixture(scope="module")
def ref_pb(tmp_path_factory):
    d = tmp_path_factory.mktemp("refproto")
    proto = d / "ref_embedding_store.proto"
    text = open(REF_PROTO).read()
    # Same fully-qualified message names as ours -> descriptor-pool
    # collision in one process (itself a parity check).  The proto
    # package name does not affect message wire bytes, so rename it for
    # the in-process copy; the gRPC method path is built manually below
    # with the reference's real service name.
    text = text.replace(
        "package featureform.embedding.proto;",
        "package refcheck.embedding.proto;",
    )
    proto.write_text(text)
    subprocess.run(
        ["protoc", f"--python_out={d}", "-I", str(d), proto.name],
        check=True,
    )
    sys.path.insert(0, str(d))
    try:
        import ref_embedding_store_pb2 as pb

        yield pb
    finally:
        sys.path.remove(str(d))


@pytest.fixture(scope="module")
def our_server():
    import embeddinghub_tpu.service.server as srv

    server, service = srv.build_server("127.0.0.1:0", data_dir=None)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    yield port
    server.stop(0)
    service.stop()


def _stub(channel, pb):
    svc = "featureform.embedding.proto.EmbeddingHub"

    def uu(name, req, resp):
        return channel.unary_unary(
            f"/{svc}/{name}",
            request_serializer=req.SerializeToString,
            response_deserializer=resp.FromString,
        )

    class S:
        CreateSpace = uu("CreateSpace", pb.CreateSpaceRequest, pb.CreateSpaceResponse)
        Set = uu("Set", pb.SetRequest, pb.SetResponse)
        Get = uu("Get", pb.GetRequest, pb.GetResponse)
        FreezeSpace = uu("FreezeSpace", pb.FreezeSpaceRequest, pb.FreezeSpaceResponse)
        NearestNeighbor = uu(
            "NearestNeighbor", pb.NearestNeighborRequest, pb.NearestNeighborResponse
        )
        MultiSet = channel.stream_unary(
            f"/{svc}/MultiSet",
            request_serializer=pb.MultiSetRequest.SerializeToString,
            response_deserializer=pb.MultiSetResponse.FromString,
        )
        Download = channel.unary_stream(
            f"/{svc}/Download",
            request_serializer=pb.DownloadRequest.SerializeToString,
            response_deserializer=pb.DownloadResponse.FromString,
        )

    return S


def test_reference_proto_client_full_flow(ref_pb, our_server):
    channel = grpc.insecure_channel(f"127.0.0.1:{our_server}")
    stub = _stub(channel, ref_pb)

    req = ref_pb.CreateSpaceRequest(name="wire", dims=3)
    stub.CreateSpace(req)

    sreq = ref_pb.SetRequest(space="wire", key="a")
    sreq.embedding.values[:] = [1.0, 2.0, 3.0]
    stub.Set(sreq)

    got = stub.Get(ref_pb.GetRequest(space="wire", key="a"))
    assert list(got.embedding.values) == [1.0, 2.0, 3.0]

    def ms():
        for key, vals in [("b", [0.0, 0.0, 1.0]), ("c", [1.0, 2.0, 2.9])]:
            r = ref_pb.MultiSetRequest(space="wire", key=key)
            r.embedding.values[:] = vals
            yield r

    stub.MultiSet(ms())

    nn = stub.NearestNeighbor(
        ref_pb.NearestNeighborRequest(space="wire", key="a", num=1)
    )
    assert list(nn.keys) == ["c"]

    rows = {r.key: list(r.embedding.values) for r in stub.Download(
        ref_pb.DownloadRequest(space="wire")
    )}
    assert set(rows) == {"a", "b", "c"}

    stub.FreezeSpace(ref_pb.FreezeSpaceRequest(name="wire"))
    with pytest.raises(grpc.RpcError) as e:
        sreq2 = ref_pb.SetRequest(space="wire", key="z")
        sreq2.embedding.values[:] = [0.0, 0.0, 0.0]
        stub.Set(sreq2)
    assert e.value.code() == grpc.StatusCode.FAILED_PRECONDITION
    channel.close()
