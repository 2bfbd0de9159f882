"""Arrow Flight streamer tests (reference streamer/iceberg_streamer.py
12-106 + streamer_proxy/main.go ticket hydration, rebuilt over the
offline store)."""

import pytest

from embeddinghub_tpu.featurestore.providers import get_provider
from embeddinghub_tpu.featurestore.streamer import (
    StreamerService,
    pyarrow_available,
    read_stream,
)

pytestmark = pytest.mark.skipif(
    not pyarrow_available(), reason="pyarrow.flight unavailable"
)


@pytest.fixture
def offline(tmp_path):
    p = get_provider("SQLITE_OFFLINE", {"path": str(tmp_path / "off.db")})
    off = p.as_offline_store()
    off.register_primary(
        "clicks", "v1",
        {"rows": [{"user": f"u{i}", "n": i, "ts": i} for i in range(100)]},
    )
    return off


def test_source_stream_roundtrip(offline):
    with StreamerService(offline) as srv:
        rows = read_stream(srv.location, {"kind": "source", "name": "clicks", "variant": "v1"})
        assert len(rows) == 100
        assert {r["user"] for r in rows} == {f"u{i}" for i in range(100)}


def test_materialized_stream(offline):
    with StreamerService(offline) as srv:
        rows = read_stream(
            srv.location,
            {"kind": "materialized", "name": "clicks", "variant": "v1",
             "entity_column": "user", "value_column": "n",
             "timestamp_column": "ts"},
        )
        got = {r["entity"]: r["value"] for r in rows}
        assert got["u7"] == 7 and len(got) == 100


def test_limit_and_validation(offline):
    import pyarrow as pa
    import pyarrow.flight as fl

    errs = (fl.FlightServerError, pa.lib.ArrowInvalid)

    with StreamerService(offline) as srv:
        rows = read_stream(
            srv.location,
            {"kind": "source", "name": "clicks", "variant": "v1", "limit": 5},
        )
        assert len(rows) == 5
        with pytest.raises(errs):
            read_stream(srv.location, {"kind": "source", "name": "clicks"})
        with pytest.raises(errs):
            read_stream(srv.location, {"kind": "source", "name": "clicks",
                                       "variant": "v1", "limit": -3})
        with pytest.raises(errs):
            read_stream(srv.location, {"kind": "nope", "name": "x", "variant": "v"})
