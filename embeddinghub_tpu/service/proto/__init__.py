import sys as _sys

from embeddinghub_tpu.service.proto import embedding_store_pb2  # noqa: F401

# protoc-generated modules import their own dependencies by bare name;
# make the module importable both ways.
_sys.modules.setdefault("embedding_store_pb2", embedding_store_pb2)

from embeddinghub_tpu.service.proto import embedding_store_pb2_grpc  # noqa: F401,E402
