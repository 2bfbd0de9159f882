from embeddinghub_tpu.parallel.mesh import default_mesh, shard_axis  # noqa: F401
from embeddinghub_tpu.parallel.sharded_flat import ShardedFlatIndex  # noqa: F401
from embeddinghub_tpu.parallel.sharded_hnsw import ShardedHNSWIndex  # noqa: F401
