from embeddinghub_tpu.ops.distance import (  # noqa: F401
    METRICS,
    pairwise_dist,
    pairwise_l2,
    pairwise_ip,
    pairwise_cosine,
    preprocess_vectors,
    sqnorms,
)
from embeddinghub_tpu.ops.topk import (  # noqa: F401
    masked_topk,
    chunked_topk_search,
    certified_topk_search,
    quantized_chunked_search,
    quantized_chunked_exact,
    quantized_chunked_ids,
    quantized_pool_rerank,
)
