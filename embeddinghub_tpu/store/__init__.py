from embeddinghub_tpu.store.errors import (  # noqa: F401
    EmbeddingHubError,
    ImmutableVersionError,
    InvalidArgumentError,
    SpaceAlreadyExistsError,
    SpaceNotFoundError,
    VersionNotFoundError,
    KeyNotFoundError,
    DimensionMismatchError,
)
from embeddinghub_tpu.store.keymap import KeyMap  # noqa: F401
from embeddinghub_tpu.store.version import Version  # noqa: F401
from embeddinghub_tpu.store.space import Space  # noqa: F401
from embeddinghub_tpu.store.hub import EmbeddingHub  # noqa: F401
