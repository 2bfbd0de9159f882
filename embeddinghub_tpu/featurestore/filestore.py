"""Filestore abstraction.

Rebuild of reference ``provider/filestore.go`` + ``filestore/filepath.go``
(S3/GCS/Azure/HDFS/local path abstraction used by the Spark/k8s offline
stores): a uniform read/write/list/exists surface over storage schemes.
Local filesystem ships; cloud schemes register the same way when their
SDKs are present (this image has no cloud credentials/egress).
"""

from __future__ import annotations

import csv
import io
import json
import os
from pathlib import Path
from typing import Callable, Iterator
from urllib.parse import urlparse

_SCHEMES: dict[str, Callable[[str], "FileStore"]] = {}


def register_scheme(scheme: str, factory: Callable[[str], "FileStore"]) -> None:
    _SCHEMES[scheme] = factory


def open_filestore(uri: str) -> "FileStore":
    """``file:///data`` or a bare path -> LocalFileStore; other schemes
    resolve through the registry."""
    parsed = urlparse(uri)
    scheme = parsed.scheme or "file"
    if scheme not in _SCHEMES:
        raise ValueError(
            f"no filestore registered for scheme {scheme!r} "
            f"(available: {sorted(_SCHEMES)})"
        )
    return _SCHEMES[scheme](uri)


class FileStore:
    def read(self, path: str) -> bytes:
        raise NotImplementedError

    def write(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def list(self, prefix: str = "") -> Iterator[str]:
        raise NotImplementedError

    # ---- structured helpers (used by offline stores / loaders)

    def read_csv(self, path: str) -> list[dict]:
        text = self.read(path).decode()
        return list(csv.DictReader(io.StringIO(text)))

    def write_csv(self, path: str, rows: list[dict]) -> None:
        if not rows:
            self.write(path, b"")
            return
        buf = io.StringIO()
        writer = csv.DictWriter(buf, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
        self.write(path, buf.getvalue().encode())

    def read_jsonl(self, path: str) -> list[dict]:
        return [
            json.loads(line)
            for line in self.read(path).decode().splitlines()
            if line.strip()
        ]

    def write_jsonl(self, path: str, rows: list[dict]) -> None:
        self.write(
            path, "\n".join(json.dumps(r) for r in rows).encode() + b"\n"
        )


class LocalFileStore(FileStore):
    def __init__(self, uri: str = "file://."):
        parsed = urlparse(uri)
        root = parsed.path or "."
        if parsed.scheme in ("", "file") and not root:
            root = "."
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _p(self, path: str) -> Path:
        p = (self.root / path).resolve()
        if not str(p).startswith(str(self.root.resolve())):
            raise ValueError(f"path escapes filestore root: {path}")
        return p

    def read(self, path: str) -> bytes:
        return self._p(path).read_bytes()

    def write(self, path: str, data: bytes) -> None:
        p = self._p(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(p.suffix + ".tmp")
        tmp.write_bytes(data)
        os.replace(tmp, p)

    def exists(self, path: str) -> bool:
        return self._p(path).exists()

    def delete(self, path: str) -> None:
        p = self._p(path)
        if p.exists():
            p.unlink()

    def list(self, prefix: str = "") -> Iterator[str]:
        base = self.root / prefix if prefix else self.root
        if not base.exists():
            return
        for p in sorted(base.rglob("*")):
            if p.is_file() and not p.name.endswith(".tmp"):
                yield str(p.relative_to(self.root))


register_scheme("file", LocalFileStore)
register_scheme("", LocalFileStore)
