"""Engine selection through the store: flat / sharded / hnsw behind the
same Space/Version surface (multi-chip path on the virtual CPU mesh)."""

import numpy as np
import pytest

from embeddinghub_tpu.store import EmbeddingHub


@pytest.mark.parametrize(
    "engine",
    ["flat", "flat-bf16", "flat-int8", "flat-int8x2", "sharded",
     "sharded-int8", "sharded-int8x2", "hnsw", "hnsw-sharded"],
)
def test_engine_end_to_end(engine, rng):
    hub = EmbeddingHub.in_memory(engine=engine)
    hub.create_space("s", dims=16)
    v = hub.get_version("s")
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    v.multiset([(f"k{i}", vecs[i]) for i in range(200)])
    assert v.nearest(1, vector=vecs[17]) == ["k17"]
    got = v.nearest(3, key="k17")
    assert "k17" not in got and len(got) == 3
    np.testing.assert_array_equal(v.get("k42"), vecs[42])


@pytest.mark.parametrize(
    "engine", ["sharded", "sharded-int8", "hnsw", "hnsw-sharded"]
)
def test_engine_snapshot_roundtrip(engine, rng, tmp_path):
    hub = EmbeddingHub.load_or_create(tmp_path / "st", engine=engine)
    hub.create_space("s", dims=8)
    v = hub.get_version("s")
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    v.multiset([(f"k{i}", vecs[i]) for i in range(100)])
    hub.save()
    hub2 = EmbeddingHub.load_or_create(tmp_path / "st", engine=engine)
    v2 = hub2.get_version("s")
    assert type(v2.index).__name__ == type(v.index).__name__
    assert v2.nearest(1, vector=vecs[31]) == ["k31"]


def test_quantized_engine_snapshot_keeps_dtype(rng, tmp_path):
    """A reloaded quantized space must stay quantized (flat_meta in the
    snapshot carries storage_dtype through the roundtrip)."""
    hub = EmbeddingHub.load_or_create(tmp_path / "st", engine="flat-int8x2")
    hub.create_space("s", dims=8)
    v = hub.get_version("s")
    vecs = rng.standard_normal((64, 8)).astype(np.float32)
    v.multiset([(f"k{i}", vecs[i]) for i in range(64)])
    hub.save()

    hub2 = EmbeddingHub.load_or_create(tmp_path / "st")
    v2 = hub2.get_version("s")
    assert v2.index.storage_dtype == "int8x2"
    assert v2.nearest(1, vector=vecs[9]) == ["k9"]
