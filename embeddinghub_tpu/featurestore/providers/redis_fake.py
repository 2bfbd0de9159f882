"""In-process RESP server fake with a RediSearch-KNN subset.

The reference proves provider logic against in-memory fakes
(``provider/unit_test_store.go:342``); this fake takes the idea one
level lower and speaks the actual wire protocol, so the REDIS_ONLINE
provider's RESP encoding, key scheme and FT.SEARCH command shape are
exercised byte-for-byte without external infrastructure.

Implements: PING, AUTH, EXISTS, DEL, HSET, HGET, FLUSHALL,
FT.CREATE (VECTOR HNSW schema), FT.SEARCH (``*=>[KNN $K @field $BLOB]``
with PARAMS/DIALECT, cosine metric, exact scan — the fake trades the
HNSW graph for exactness, which only makes tests stricter).
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading


class _State:
    def __init__(self):
        self.hashes: dict[str, dict[str, bytes]] = {}
        self.indexes: dict[str, dict] = {}  # idx name -> {field, dims, metric}
        self.lock = threading.Lock()


def _cos_dist(a, b) -> float:
    num = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    if na == 0 or nb == 0:
        return 1.0
    return 1.0 - num / (na * nb)


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        buf = b""
        while True:
            try:
                chunk = self.request.recv(65536)
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            while True:
                parsed, rest = self._try_parse(buf)
                if parsed is None:
                    break
                buf = rest
                try:
                    reply = self._dispatch(parsed)
                except Exception as e:  # noqa: BLE001 — protocol error reply
                    reply = b"-ERR %s\r\n" % str(e).encode()
                try:
                    self.request.sendall(reply)
                except OSError:
                    return

    # --- RESP parsing ---

    def _try_parse(self, buf: bytes):
        if not buf.startswith(b"*"):
            return None, buf
        try:
            head, rest = buf.split(b"\r\n", 1)
            n = int(head[1:])
            args = []
            for _ in range(n):
                if not rest.startswith(b"$"):
                    return None, buf
                lhead, rest2 = rest.split(b"\r\n", 1)
                ln = int(lhead[1:])
                if len(rest2) < ln + 2:
                    return None, buf
                args.append(rest2[:ln])
                rest = rest2[ln + 2 :]
            return args, rest
        except ValueError:
            return None, buf

    # --- replies ---

    @staticmethod
    def _simple(s: str) -> bytes:
        return b"+%s\r\n" % s.encode()

    @staticmethod
    def _int(i: int) -> bytes:
        return b":%d\r\n" % i

    @staticmethod
    def _bulk(b: bytes | None) -> bytes:
        if b is None:
            return b"$-1\r\n"
        return b"$%d\r\n%s\r\n" % (len(b), b)

    @classmethod
    def _array(cls, items: list[bytes]) -> bytes:
        return b"*%d\r\n" % len(items) + b"".join(items)

    # --- commands ---

    def _dispatch(self, args: list[bytes]) -> bytes:
        st: _State = self.server.state  # type: ignore[attr-defined]
        cmd = args[0].decode().upper()
        if cmd == "PING":
            return self._simple("PONG")
        if cmd == "AUTH":
            return self._simple("OK")
        if cmd == "FLUSHALL":
            with st.lock:
                st.hashes.clear()
                st.indexes.clear()
            return self._simple("OK")
        if cmd == "EXISTS":
            with st.lock:
                return self._int(int(args[1].decode() in st.hashes))
        if cmd == "DEL":
            with st.lock:
                n = 0
                for key in args[1:]:
                    n += st.hashes.pop(key.decode(), None) is not None
            return self._int(n)
        if cmd == "HSET":
            key = args[1].decode()
            with st.lock:
                h = st.hashes.setdefault(key, {})
                added = 0
                for f, v in zip(args[2::2], args[3::2]):
                    added += f.decode() not in h
                    h[f.decode()] = v
            return self._int(added)
        if cmd == "HGET":
            with st.lock:
                h = st.hashes.get(args[1].decode(), {})
                return self._bulk(h.get(args[2].decode()))
        if cmd == "FT.CREATE":
            return self._ft_create(st, args)
        if cmd == "FT.SEARCH":
            return self._ft_search(st, args)
        raise ValueError(f"unknown command '{cmd}'")

    def _ft_create(self, st: _State, args: list[bytes]) -> bytes:
        toks = [a.decode() for a in args[1:]]
        idx = toks[0]
        if idx in st.indexes:
            return b"-Index already exists\r\n"
        schema_at = [t.upper() for t in toks].index("SCHEMA")
        field = toks[schema_at + 1]
        rest = [t.upper() for t in toks[schema_at + 2 :]]
        if not rest or rest[0] != "VECTOR":
            raise ValueError("only VECTOR schemas supported")
        params = toks[schema_at + 4 :]  # after VECTOR HNSW: <n> k v k v ...
        kv = {}
        plist = params[1:]
        for i in range(0, len(plist) - 1, 2):
            kv[plist[i].upper()] = plist[i + 1]
        dims = int(kv.get("DIM", "0"))
        metric = kv.get("DISTANCE_METRIC", "COSINE").upper()
        with st.lock:
            st.indexes[idx] = {"field": field, "dims": dims, "metric": metric}
        return self._simple("OK")

    def _ft_search(self, st: _State, args: list[bytes]) -> bytes:
        toks = args[1:]
        idx = toks[0].decode()
        with st.lock:
            spec = st.indexes.get(idx)
        if spec is None:
            raise ValueError(f"no such index {idx}")
        # PARAMS <n> K <k> BLOB <bytes>
        k, blob = 10, b""
        uppers = [t.decode(errors="replace").upper() for t in toks]
        if "PARAMS" in uppers:
            at = uppers.index("PARAMS")
            nargs = int(toks[at + 1])
            plist = toks[at + 2 : at + 2 + nargs]
            for i in range(0, len(plist) - 1, 2):
                name = plist[i].decode().upper()
                if name == "K":
                    k = int(plist[i + 1])
                elif name == "BLOB":
                    blob = plist[i + 1]
        q = list(struct.unpack(f"<{len(blob) // 4}f", blob))
        field = spec["field"]
        # match documents: hash keys whose JSON matches the index's
        # Prefix/Feature/Variant and that carry the vector field
        try:
            want = json.loads(idx)
        except ValueError:
            want = None
        scored = []
        with st.lock:
            for key, h in st.hashes.items():
                if field not in h:
                    continue
                if want is not None:
                    try:
                        kj = json.loads(key)
                    except ValueError:
                        continue
                    if any(
                        kj.get(f) != want.get(f)
                        for f in ("Prefix", "Feature", "Variant")
                    ):
                        continue
                vec = list(
                    struct.unpack(f"<{len(h[field]) // 4}f", h[field])
                )
                scored.append((_cos_dist(q, vec), key, h[field]))
        scored.sort(key=lambda t: t[0])
        top = scored[:k]
        items: list[bytes] = [self._int(len(top))]
        for dist, key, raw in top:
            items.append(self._bulk(key.encode()))
            items.append(
                self._array(
                    [
                        self._bulk(f"__{field}_score".encode()),
                        self._bulk(str(dist).encode()),
                    ]
                )
            )
        return b"*%d\r\n" % len(items) + b"".join(items)


class FakeRedisServer:
    """Threaded RESP server on an ephemeral port; use as a context
    manager or call start()/stop()."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        class _Srv(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Srv((host, port), _Handler)
        self._server.state = _State()  # type: ignore[attr-defined]
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "FakeRedisServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
