"""Filestore abstraction tests."""

import pytest

from embeddinghub_tpu.featurestore.filestore import (
    LocalFileStore,
    open_filestore,
)


def test_local_roundtrip(tmp_path):
    fs = open_filestore(f"file://{tmp_path}")
    assert isinstance(fs, LocalFileStore)
    fs.write("a/b.txt", b"hello")
    assert fs.exists("a/b.txt")
    assert fs.read("a/b.txt") == b"hello"
    assert list(fs.list()) == ["a/b.txt"]
    fs.delete("a/b.txt")
    assert not fs.exists("a/b.txt")


def test_csv_jsonl_helpers(tmp_path):
    fs = LocalFileStore(f"file://{tmp_path}")
    rows = [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]
    fs.write_csv("d.csv", rows)
    assert fs.read_csv("d.csv") == rows
    jrows = [{"a": 1}, {"a": 2}]
    fs.write_jsonl("d.jsonl", jrows)
    assert fs.read_jsonl("d.jsonl") == jrows


def test_path_escape_rejected(tmp_path):
    fs = LocalFileStore(f"file://{tmp_path}")
    with pytest.raises(ValueError):
        fs.read("../../etc/passwd")


def test_unknown_scheme():
    with pytest.raises(ValueError):
        open_filestore("s3://bucket/path")
