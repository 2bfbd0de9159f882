from embeddinghub_tpu.index.base import Index  # noqa: F401
from embeddinghub_tpu.index.flat import FlatIndex  # noqa: F401
