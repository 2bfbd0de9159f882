"""Arrow Flight data-plane streamer.

Rebuild of the reference's streaming data plane
(``streamer/iceberg_streamer.py:12-106``: a pyarrow Flight server that
turns a JSON ticket into a record-batch stream; ``streamer_proxy/
main.go:32-174``: the Go proxy that hydrates tickets).  The TPU build
has no Iceberg/Glue in-image, so the streamer serves the same role over
this package's offline stores and training sets:

  ticket (JSON):
    {"kind": "source",       "name": n, "variant": v, "limit": L}
    {"kind": "materialized", "name": n, "variant": v,
     "entity_column": e, "value_column": c, "timestamp_column": t}
    {"kind": "training_set", "name": n, "variant": v}

``do_get`` validates the ticket (missing-field errors mirror the
reference's), pulls rows from the registered offline provider and
streams Arrow record batches.  Gated on pyarrow being importable — the
package never hard-requires it.
"""

from __future__ import annotations

import json
import threading
from typing import Any

DEFAULT_LIMIT = 2_000_000  # reference TWO_MILLION_RECORD_LIMIT


def pyarrow_available() -> bool:
    try:
        import pyarrow  # noqa: F401
        import pyarrow.flight  # noqa: F401

        return True
    except ImportError:
        return False


class StreamerService:
    """Flight server over an OfflineStore + ServingClient pair."""

    def __init__(self, offline_store, serving=None, host="127.0.0.1", port=0):
        import pyarrow.flight as fl

        self._offline = offline_store
        self._serving = serving
        outer = self

        class _Server(fl.FlightServerBase):
            def do_get(self, context, ticket):
                return outer._do_get(ticket)

        self._server = _Server(f"grpc://{host}:{port}")
        self.port = self._server.port
        self.location = f"grpc://{host}:{self.port}"
        self._thread: threading.Thread | None = None

    # ---- server plumbing ----

    def start(self) -> "StreamerService":
        self._thread = threading.Thread(target=self._server.serve, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ---- ticket handling (reference do_get shape) ----

    def _do_get(self, ticket):
        import pyarrow as pa
        import pyarrow.flight as fl

        try:
            req: dict[str, Any] = json.loads(ticket.ticket.decode("utf-8"))
        except json.JSONDecodeError as e:
            raise ValueError("Invalid JSON format in ticket") from e

        missing = [f for f in ("kind", "name", "variant") if not req.get(f)]
        if missing:
            raise ValueError(
                "Missing required request fields: " + ", ".join(missing)
            )
        limit = req.get("limit", DEFAULT_LIMIT)
        if not isinstance(limit, int) or limit <= 0:
            raise ValueError(
                f"Invalid 'limit' value: {limit}. Must be a positive integer value."
            )

        kind = req["kind"]
        name, variant = req["name"], req["variant"]
        if kind == "source":
            rows = self._offline.table_rows(name, variant)[:limit]
        elif kind == "materialized":
            mat = self._offline.materialize(
                name,
                variant,
                req.get("entity_column", "entity"),
                req.get("value_column", "value"),
                req.get("timestamp_column", ""),
            )
            import itertools

            rows = [
                {"entity": e, "value": v}
                for e, v in itertools.islice(mat.rows(), limit)
            ]
        elif kind == "training_set":
            import itertools

            rows = [
                {"features": json.dumps(feats), "label": label}
                for feats, label in itertools.islice(
                    self._offline.training_set_rows(name, variant), limit
                )
            ]
        else:
            raise ValueError(f"unknown ticket kind: {kind!r}")

        if not rows:
            schema = pa.schema([("empty", pa.int64())])
            return fl.RecordBatchStream(
                pa.RecordBatchReader.from_batches(schema, [])
            )
        tbl = pa.Table.from_pylist(rows)
        reader = pa.RecordBatchReader.from_batches(
            tbl.schema, tbl.to_batches(max_chunksize=8192)
        )
        return fl.RecordBatchStream(reader)


def read_stream(location: str, ticket: dict) -> "list[dict]":
    """Client helper: fetch a ticket's stream and return rows as dicts."""
    import pyarrow.flight as fl

    client = fl.connect(location)
    reader = client.do_get(fl.Ticket(json.dumps(ticket).encode()))
    return reader.read_all().to_pylist()


class StreamerProxy:
    """Ticket-hydrating Flight proxy in front of a :class:`StreamerService`
    (the reference's Go proxy tier, ``streamer_proxy/main.go:32-174``).

    Clients send a *logical* ticket naming a registered resource:

        {"source": name, "variant": v, "resourceType": t, "limit": L}

    The proxy validates the fields (same missing-field errors as
    ``hydrateTicket``, main.go:55-72), resolves the source variant
    against the metadata store — unknown resources fail here, before
    any data movement, exactly like the reference's
    ``GetSourceVariant`` call — then *hydrates* a physical ticket in
    the inner streamer's schema and relays the record-batch stream
    unmodified (main.go:203-219's Recv/Send loop; pyarrow's
    GeneratorStream plays that role).

    resourceType maps onto the inner ticket kinds:
      "source"/"primary"/"transformation" -> "source"
      "materialization"                   -> "materialized"
      "training_set"                      -> "training_set"
    """

    _KIND = {
        "source": "source",
        "primary": "source",
        "transformation": "source",
        "materialization": "materialized",
        "training_set": "training_set",
    }

    def __init__(self, metadata, streamer_location: str,
                 host: str = "127.0.0.1", port: int = 0):
        import pyarrow.flight as fl

        self._meta = metadata
        self._inner = streamer_location
        outer = self

        class _Proxy(fl.FlightServerBase):
            def do_get(self, context, ticket):
                return outer._do_get(ticket)

        self._server = _Proxy(f"grpc://{host}:{port}")
        self.port = self._server.port
        self.location = f"grpc://{host}:{self.port}"
        self._thread: threading.Thread | None = None

    def start(self) -> "StreamerProxy":
        self._thread = threading.Thread(target=self._server.serve, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def _hydrate(self, raw: bytes) -> dict:
        from embeddinghub_tpu.featurestore.resources import (
            ResourceID,
            ResourceType,
        )

        try:
            req: dict[str, Any] = json.loads(raw.decode("utf-8"))
        except json.JSONDecodeError as e:
            raise ValueError("failed to parse ticket JSON") from e
        for f in ("source", "variant", "resourceType"):
            if not req.get(f):
                raise ValueError(f"missing '{f}' in ticket data")
        kind = self._KIND.get(req["resourceType"])
        if kind is None:
            raise ValueError(
                f"unsupported resourceType: {req['resourceType']!r}"
            )
        limit = req.get("limit") or DEFAULT_LIMIT
        if not isinstance(limit, int) or limit <= 0:
            raise ValueError(f"invalid 'limit' value: {limit}")
        # existence check against metadata before any data movement
        rtype = (
            ResourceType.TRAINING_SET_VARIANT
            if kind == "training_set"
            else ResourceType.SOURCE_VARIANT
        )
        self._meta.get(ResourceID(rtype, req["source"], req["variant"]))
        hydrated = {
            "kind": kind,
            "name": req["source"],
            "variant": req["variant"],
            "limit": limit,
        }
        if kind == "materialized":
            for f in ("entity_column", "value_column", "timestamp_column"):
                if f in req:
                    hydrated[f] = req[f]
        return hydrated

    def _do_get(self, ticket):
        import pyarrow.flight as fl

        hydrated = self._hydrate(ticket.ticket)
        client = fl.connect(self._inner)
        reader = client.do_get(
            fl.Ticket(json.dumps(hydrated).encode())
        )

        def relay():
            try:
                for chunk in reader:
                    yield chunk.data
            finally:
                client.close()

        return fl.GeneratorStream(reader.schema, relay())
