"""Offline in-process index tests (reference: offlinehub_test.py)."""

import numpy as np
import pytest

from embeddinghub_tpu.sdk.offline import Index


def test_construct_from_iter():
    idx = Index([("a", [1, 2, 3]), ("b", [3, 2, 1])], dims=3)
    assert idx.size() == 2
    np.testing.assert_array_equal(idx.get("a"), [1, 2, 3])


def test_construct_from_mapping():
    idx = Index({"a": [1, 2, 3]}, dims=3)
    assert idx.size() == 1


def test_empty_init_then_set():
    idx = Index([], dims=2)
    assert idx.size() == 0
    idx.set("x", [1, 0])
    assert idx.size() == 1
    np.testing.assert_array_equal(idx.get("x"), [1, 0])


def test_overwrite_does_not_grow():
    idx = Index([("a", [1, 1])], dims=2)
    idx.set("a", [2, 2])
    assert idx.size() == 1
    np.testing.assert_array_equal(idx.get("a"), [2, 2])


def test_get_missing_raises():
    idx = Index([], dims=2)
    with pytest.raises(KeyError):
        idx.get("missing")


def test_multiget():
    idx = Index({"a": [1, 0], "b": [0, 1]}, dims=2)
    got = idx.multiget(["b", "a"])
    np.testing.assert_array_equal(got[0], [0, 1])
    np.testing.assert_array_equal(got[1], [1, 0])


def test_nn_keyed_excludes_self():
    idx = Index({"a": [0, 0], "b": [1, 0], "c": [5, 5]}, dims=2)
    assert idx.nearest_neighbor(1, key="a") == ["b"]


def test_nn_by_embedding():
    idx = Index({"a": [0, 0], "b": [1, 0]}, dims=2)
    assert idx.nearest_neighbor(1, embedding=[0.1, 0.0]) == ["a"]


def test_nn_batch():
    idx = Index({"a": [0, 0], "b": [10, 10]}, dims=2)
    res = idx.nearest_neighbor_batch(1, [[0.1, 0.1], [9.0, 9.0]])
    assert res == [["a"], ["b"]]


def test_growth_past_initial_capacity(rng):
    n = 3000
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    idx = Index(((f"k{i}", vecs[i]) for i in range(n)), dims=8)
    assert idx.size() == n
    assert idx.nearest_neighbor(1, embedding=vecs[1234]) == ["k1234"]
