from embeddinghub_tpu.sdk.client import EmbeddingHubClient  # noqa: F401
from embeddinghub_tpu.sdk.offline import Index  # noqa: F401
