"""Persistence: snapshots + write-ahead log.

The RocksDB replacement (reference: ``storage.{h,cc}`` one-DB-per-
version, ``serializer.cc`` proto float lists, ``iterator.cc`` snapshot
scans).  TPU-native storage is the packed arena itself, so persistence
becomes:

  * **snapshot**: the arena + keymap + index aux arrays dumped as
    ``.npy`` / json under the version directory — O(bytes), sequential,
    mmap-able on load;
  * **WAL**: an append-only record log capturing every write between
    snapshots; recovery = load snapshot, replay WAL tail.  (The
    reference instead paid a RocksDB Put per set and rebuilt the ANN
    index from a full scan at load, ``version.cc:64-74``; our snapshot
    restores the index directly, with WAL replay covering the tail.)

WAL record format (little-endian):
    u8  tag  (1=set, 2=delete, 3=freeze)
    set:    u32 key_len, key utf8, u32 dims, dims * f32
    delete: u32 key_len, key utf8
    freeze: (nothing)
"""

from __future__ import annotations

import json
import os
import struct
from pathlib import Path

import numpy as np

_TAG_SET = 1
_TAG_DELETE = 2
_TAG_FREEZE = 3


class VersionWal:
    """Append-only write log for one version.

    Durability: by default appends are flushed to the OS page cache
    (``f.flush()``), which survives process crashes (SIGKILL) but not
    power loss / kernel panics — the same guarantee the reference gets
    from RocksDB's default WAL settings.  Pass ``fsync=True`` for
    group-committed ``os.fsync`` per append batch (power-loss durable,
    slower).
    """

    def __init__(self, path: str | Path, fsync: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "ab")
        self._fsync = bool(fsync)

    def _commit(self) -> None:
        self._f.flush()
        if self._fsync:
            os.fsync(self._f.fileno())

    def append_many(self, keys: list[str], vecs: np.ndarray) -> None:
        parts = []
        dims = vecs.shape[1]
        for key, vec in zip(keys, vecs):
            kb = key.encode("utf-8")
            parts.append(struct.pack("<BI", _TAG_SET, len(kb)))
            parts.append(kb)
            parts.append(struct.pack("<I", dims))
            parts.append(np.ascontiguousarray(vec, dtype="<f4").tobytes())
        self._f.write(b"".join(parts))
        self._commit()

    def append_delete(self, key: str) -> None:
        kb = key.encode("utf-8")
        self._f.write(struct.pack("<BI", _TAG_DELETE, len(kb)) + kb)
        self._commit()

    def append_freeze(self) -> None:
        self._f.write(struct.pack("<B", _TAG_FREEZE))
        self._commit()

    def close(self) -> None:
        self._f.close()

    def truncate(self) -> None:
        """Called after a snapshot subsumes the log."""
        self._f.close()
        self._f = open(self.path, "wb")

    @staticmethod
    def replay(path: str | Path):
        """Yield ('set', key, vec) | ('delete', key) | ('freeze',) records.
        Stops cleanly at a torn tail (partial final record)."""
        p = Path(path)
        if not p.exists():
            return
        data = p.read_bytes()
        off, n = 0, len(data)
        while off < n:
            tag = data[off]
            off += 1
            try:
                if tag == _TAG_SET:
                    (klen,) = struct.unpack_from("<I", data, off)
                    off += 4
                    if off + klen > n:
                        return  # torn tail inside key bytes
                    key = data[off : off + klen].decode("utf-8")
                    off += klen
                    (dims,) = struct.unpack_from("<I", data, off)
                    off += 4
                    if off + 4 * dims > n:
                        return  # torn tail inside vector bytes
                    vec = np.frombuffer(data, dtype="<f4", count=dims, offset=off)
                    off += 4 * dims
                    yield ("set", key, np.array(vec))
                elif tag == _TAG_DELETE:
                    (klen,) = struct.unpack_from("<I", data, off)
                    off += 4
                    if off + klen > n:
                        return
                    key = data[off : off + klen].decode("utf-8")
                    off += klen
                    yield ("delete", key)
                elif tag == _TAG_FREEZE:
                    yield ("freeze",)
                else:
                    return  # corrupt tail
            except (struct.error, ValueError, UnicodeDecodeError):
                return  # torn tail


# ---------------------------------------------------------------- snapshots


def _index_registry() -> dict:
    """Index classes restorable from snapshots (imported lazily to avoid
    import cycles; HNSW/IVF register themselves as they land)."""
    from embeddinghub_tpu.index.flat import FlatIndex

    registry = {"FlatIndex": FlatIndex}
    try:
        from embeddinghub_tpu.index.hnsw import HNSWIndex

        registry["HNSWIndex"] = HNSWIndex
    except ImportError:
        pass
    try:
        from embeddinghub_tpu.parallel.sharded_flat import ShardedFlatIndex

        registry["ShardedFlatIndex"] = ShardedFlatIndex
    except ImportError:
        pass
    try:
        from embeddinghub_tpu.parallel.sharded_hnsw import ShardedHNSWIndex

        registry["ShardedHNSWIndex"] = ShardedHNSWIndex
    except ImportError:
        pass
    return registry


def save_version(vdir: str | Path, version) -> None:
    """Snapshot into a FRESH uniquely-named directory, then atomically
    repoint meta.json at it.  This makes the array set atomic with the
    metadata (a crash mid-save leaves meta pointing at the previous
    complete snapshot) and prevents stale ``.npy`` files from an earlier,
    differently-shaped snapshot being resurrected on load."""
    vdir = Path(vdir)
    vdir.mkdir(parents=True, exist_ok=True)
    existing = sorted(vdir.glob("index-*"))
    gen = 1 + max(
        (int(p.name.split("-")[1]) for p in existing if p.name.split("-")[1].isdigit()),
        default=-1,
    )
    snap = vdir / f"index-{gen:06d}"
    snap.mkdir()
    meta = {
        "space": version.space,
        "name": version.name,
        "dims": version.dims,
        "metric": version.metric,
        "immutable": version.immutable,
        "index_type": type(version.index).__name__,
        "index_dir": snap.name,
        "keymap": version.keymap.to_state(),
    }
    for arr_name, arr in version.index.state_arrays().items():
        np.save(snap / f"{arr_name}.npy", arr)
    tmp = vdir / "meta.json.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, vdir / "meta.json")
    if version._wal is not None:
        version._wal.truncate()
    # Old snapshot dirs (and the legacy flat index/ dir) are now garbage.
    import shutil

    for p in existing + [vdir / "index"]:
        if p != snap and p.is_dir():
            shutil.rmtree(p, ignore_errors=True)


def load_version(vdir: str | Path, wal_path: str | Path | None = None):
    from embeddinghub_tpu.store.keymap import KeyMap
    from embeddinghub_tpu.store.version import Version

    vdir = Path(vdir)
    meta = json.loads((vdir / "meta.json").read_text())
    snap = vdir / meta.get("index_dir", "index")
    # Copy-on-write mmaps: multi-GB arenas page in lazily off disk (the
    # index adopts them directly — FlatIndex.from_state), stay writable
    # for point updates, and never touch the snapshot file.  Deleting
    # the snapshot dir later (save_version GC) is safe: the inode lives
    # while mapped.
    arrays = {
        p.stem: np.load(p, mmap_mode="c") for p in sorted(snap.glob("*.npy"))
    }
    index_cls = _index_registry()[meta["index_type"]]
    index = index_cls.from_state(meta["dims"], meta["metric"], arrays)
    version = Version(
        meta["space"], meta["name"], meta["dims"], meta["metric"], index=index
    )
    version.keymap = KeyMap.from_state(meta["keymap"])
    version.immutable = meta["immutable"]
    if wal_path is not None:
        _replay_into(version, wal_path)
        version._wal = VersionWal(wal_path)
    return version


def _replay_into(version, wal_path) -> None:
    for rec in VersionWal.replay(wal_path):
        if rec[0] == "set":
            version.immutable = False  # replay must be able to write
            version.multiset([(rec[1], rec[2])])
        elif rec[0] == "delete":
            version.immutable = False
            try:
                version.delete(rec[1])
            except Exception:
                pass
        elif rec[0] == "freeze":
            version.immutable = True
