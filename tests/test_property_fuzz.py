"""Property-based store semantics + WAL/snapshot crash-consistency fuzz.

Reference semantics anchored: Version.set/get/immutability
(``version.cc:47-56``, ``version.h:52-67``) and RocksDB-WAL-style
prefix-durability on crash (torn tails must never poison recovery,
``storage.cc:28-36``).  The fuzz half cuts the WAL at every byte
boundary and checks the replay is always a clean record prefix; the
interleaving half mixes snapshots and torn WAL tails.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from embeddinghub_tpu.store import errors
from embeddinghub_tpu.store.persistence import (
    VersionWal,
    _replay_into,
    load_version,
    save_version,
)
from embeddinghub_tpu.store.version import Version

DIMS = 4
KEYS = [f"k{i}" for i in range(6)]


def _vec(seed: int) -> np.ndarray:
    return (
        np.arange(DIMS, dtype=np.float32) * 0.25 + np.float32(seed)
    )


op_st = st.one_of(
    st.tuples(
        st.just("set"), st.sampled_from(KEYS), st.integers(0, 99)
    ),
    st.tuples(st.just("delete"), st.sampled_from(KEYS)),
    st.tuples(st.just("freeze")),
)


def _apply(version: Version, model: dict, ops, frozen: list) -> None:
    """Apply ops to both the version and a dict model, mirroring the
    freeze semantics (writes after freeze must raise and not mutate)."""
    for op in ops:
        if op[0] == "set":
            if frozen[0]:
                with pytest.raises(errors.ImmutableVersionError):
                    version.set(op[1], _vec(op[2]))
            else:
                version.set(op[1], _vec(op[2]))
                model[op[1]] = _vec(op[2])
        elif op[0] == "delete":
            if frozen[0]:
                with pytest.raises(errors.ImmutableVersionError):
                    version.delete(op[1])
            elif op[1] in model:
                version.delete(op[1])
                del model[op[1]]
            else:
                with pytest.raises(errors.KeyNotFoundError):
                    version.delete(op[1])
        else:
            version.make_immutable()
            frozen[0] = True


def _check_matches(version: Version, model: dict) -> None:
    assert version.size == len(model)
    for k, v in model.items():
        np.testing.assert_array_equal(version.get(k), v)
    for k in KEYS:
        if k not in model:
            with pytest.raises(errors.KeyNotFoundError):
                version.get(k)
    assert dict(version.iterator()).keys() == model.keys()


@settings(max_examples=30, deadline=None)
@given(st.lists(op_st, max_size=25))
def test_version_matches_model(ops):
    version = Version("s", "initial", DIMS)
    model: dict = {}
    _apply(version, model, ops, [False])
    _check_matches(version, model)
    if model:
        # exact-match nearest must return the key itself first
        key, vec = next(iter(model.items()))
        assert version.nearest(1, vector=vec)[0] in model


@settings(max_examples=25, deadline=None)
@given(st.lists(op_st, max_size=20))
def test_wal_roundtrip_matches(ops):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        wal_path = os.path.join(d, "wal.bin")
        version = Version("s", "initial", DIMS, wal=VersionWal(wal_path))
        model: dict = {}
        frozen = [False]
        _apply(version, model, ops, frozen)
        version._wal.close()

        recovered = Version("s", "initial", DIMS)
        _replay_into(recovered, wal_path)
        _check_matches(recovered, model)
        assert recovered.immutable == frozen[0]


def _build_wal_bytes(ops) -> tuple[bytes, list]:
    """Write ops to a WAL; return raw bytes + the full record list."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        wal_path = os.path.join(d, "wal.bin")
        wal = VersionWal(wal_path)
        for op in ops:
            if op[0] == "set":
                wal.append_many([op[1]], _vec(op[2])[None, :])
            elif op[0] == "delete":
                wal.append_delete(op[1])
            else:
                wal.append_freeze()
        wal.close()
        data = open(wal_path, "rb").read()
        full = list(VersionWal.replay(wal_path))
    return data, full


def test_wal_torn_tail_every_byte():
    """Cutting the WAL at ANY byte must replay to a clean record prefix
    (never an exception, never a corrupted or reordered record)."""
    rng = np.random.default_rng(0)
    ops = []
    for _ in range(12):
        r = rng.integers(0, 10)
        if r < 7:
            ops.append(("set", KEYS[rng.integers(0, len(KEYS))],
                        int(rng.integers(0, 99))))
        elif r < 9:
            ops.append(("delete", KEYS[rng.integers(0, len(KEYS))]))
        else:
            ops.append(("freeze",))
    data, full = _build_wal_bytes(ops)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cut_path = os.path.join(d, "cut.bin")
        for cut in range(len(data) + 1):
            with open(cut_path, "wb") as f:
                f.write(data[:cut])
            got = list(VersionWal.replay(cut_path))
            assert len(got) <= len(full)
            for g, want in zip(got, full):
                assert g[0] == want[0]
                if g[0] == "set":
                    assert g[1] == want[1]
                    np.testing.assert_array_equal(g[2], want[2])
                elif g[0] == "delete":
                    assert g[1] == want[1]
        # the full file replays every record
        with open(cut_path, "wb") as f:
            f.write(data)
        assert len(list(VersionWal.replay(cut_path))) == len(full)


def test_snapshot_plus_torn_wal_interleaving():
    """snapshot -> more writes -> crash (torn WAL tail): recovery must
    contain the full snapshot state plus a clean prefix of the post-
    snapshot writes, for every cut point."""
    import tempfile

    rng = np.random.default_rng(1)
    pre = [("set", k, int(rng.integers(0, 99))) for k in KEYS[:4]]
    post = [
        ("set", KEYS[int(rng.integers(0, len(KEYS)))],
         int(rng.integers(100, 199)))
        for _ in range(8)
    ] + [("delete", KEYS[0])]

    with tempfile.TemporaryDirectory() as d:
        vdir = os.path.join(d, "v")
        wal_path = os.path.join(d, "wal.bin")
        version = Version("s", "initial", DIMS, wal=VersionWal(wal_path))
        model: dict = {}
        _apply(version, model, pre, [False])
        save_version(vdir, version)  # truncates the WAL
        _apply(version, model, post, [False])
        version._wal.close()
        data = open(wal_path, "rb").read()

        for cut in sorted({0, 1, len(data) // 3, len(data) // 2,
                           len(data) - 1, len(data)}):
            with open(wal_path, "wb") as f:
                f.write(data[:cut])
            recovered = load_version(vdir, wal_path)
            # expected = snapshot model + surviving clean prefix
            expect = {k: _vec(s) for _, k, s in pre}
            for rec in VersionWal.replay(wal_path):
                if rec[0] == "set":
                    expect[rec[1]] = rec[2]
                elif rec[0] == "delete":
                    expect.pop(rec[1], None)
            _check_matches(recovered, expect)
