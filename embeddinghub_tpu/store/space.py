"""Space — a named table holding versions.

Rebuild of reference ``embeddingstore/space.{h,cc}``: a version registry
(default version "initial" is created implicitly by the server,
``server.cc:48``) with per-version storage.  The reference opened one
RocksDB per space/version; here a space is a directory of version
snapshots + WALs.
"""

from __future__ import annotations

import json
from pathlib import Path

from embeddinghub_tpu.store.persistence import VersionWal, load_version, save_version
from embeddinghub_tpu.store.version import Version

DEFAULT_VERSION = "initial"


class Space:
    def __init__(self, name: str, path: str | Path | None = None):
        self.name = name
        self.path = Path(path) if path is not None else None
        self._versions: dict[str, Version] = {}

    def create_version(
        self, name: str, dims: int, metric: str = "l2", index=None
    ) -> Version:
        if name in self._versions:
            return self._versions[name]
        wal = None
        if self.path is not None:
            vdir = self.path / name
            wal = VersionWal(vdir / "wal.bin")
            # Eager config row so WAL-only recovery knows dims/metric (the
            # reference's VersionEntry proto row, space.cc:36-45).
            (vdir / "config.json").write_text(
                json.dumps({"space": self.name, "name": name, "dims": int(dims), "metric": metric})
            )
        version = Version(self.name, name, dims, metric, index=index, wal=wal)
        self._versions[name] = version
        return version

    def get_version(self, name: str) -> Version | None:
        return self._versions.get(name)

    def default_version(self) -> Version | None:
        return self._versions.get(DEFAULT_VERSION)

    def versions(self) -> list[str]:
        return list(self._versions)

    # -------------------------------------------------------------- snapshot

    def save(self) -> None:
        if self.path is None:
            return
        for name, version in self._versions.items():
            save_version(self.path / name, version)

    @classmethod
    def load(cls, name: str, path: str | Path) -> "Space":
        space = cls(name, path)
        path = Path(path)
        if path.exists():
            for vdir in sorted(p for p in path.iterdir() if p.is_dir()):
                if (vdir / "meta.json").exists():
                    v = load_version(vdir, wal_path=vdir / "wal.bin")
                    space._versions[v.name] = v
                elif (vdir / "wal.bin").exists():
                    # No snapshot yet: rebuild purely from the WAL (the
                    # reference's rebuild-from-storage-scan analog,
                    # version.cc:64-74).
                    space._rebuild_from_wal(vdir)
        return space

    def _rebuild_from_wal(self, vdir: Path) -> None:
        cfg_path = vdir / "config.json"
        if cfg_path.exists():
            cfg = json.loads(cfg_path.read_text())
            dims, metric = cfg["dims"], cfg.get("metric", "l2")
        else:
            # Legacy WAL without a config row: infer dims from the first
            # set record, assume l2.
            dims, metric = None, "l2"
            for rec in VersionWal.replay(vdir / "wal.bin"):
                if rec[0] == "set":
                    dims = len(rec[2])
                    break
            if dims is None:
                return
        version = Version(self.name, vdir.name, dims, metric)
        from embeddinghub_tpu.store.persistence import _replay_into

        _replay_into(version, vdir / "wal.bin")
        version._wal = VersionWal(vdir / "wal.bin")
        self._versions[vdir.name] = version
