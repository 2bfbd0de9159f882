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


def _meta_with_clicks():
    from embeddinghub_tpu.featurestore.metadata import MetadataStore
    from embeddinghub_tpu.featurestore.resources import SourceVariant

    meta = MetadataStore()
    meta.create(SourceVariant(name="clicks", variant="v1",
                              primary={"table": "clicks"}))
    return meta


def test_proxy_hydrates_and_relays(offline):
    from embeddinghub_tpu.featurestore.streamer import StreamerProxy

    with StreamerService(offline) as srv:
        with StreamerProxy(_meta_with_clicks(), srv.location) as proxy:
            rows = read_stream(
                proxy.location,
                {"source": "clicks", "variant": "v1",
                 "resourceType": "source"},
            )
            assert len(rows) == 100
            assert {r["user"] for r in rows} == {f"u{i}" for i in range(100)}
            # materialization resourceType maps to the inner
            # "materialized" kind with column hydration
            mat = read_stream(
                proxy.location,
                {"source": "clicks", "variant": "v1",
                 "resourceType": "materialization",
                 "entity_column": "user", "value_column": "n",
                 "timestamp_column": "ts"},
            )
            assert {r["entity"]: r["value"] for r in mat}["u3"] == 3


def test_proxy_validation_and_unknown_resource(offline):
    import pyarrow as pa
    import pyarrow.flight as fl

    from embeddinghub_tpu.featurestore.streamer import StreamerProxy

    errs = (fl.FlightServerError, pa.lib.ArrowInvalid)
    with StreamerService(offline) as srv:
        with StreamerProxy(_meta_with_clicks(), srv.location) as proxy:
            # missing-field errors mirror the reference hydrateTicket
            with pytest.raises(errs):
                read_stream(proxy.location,
                            {"variant": "v1", "resourceType": "source"})
            with pytest.raises(errs):
                read_stream(proxy.location,
                            {"source": "clicks", "resourceType": "source"})
            with pytest.raises(errs):
                read_stream(proxy.location,
                            {"source": "clicks", "variant": "v1"})
            # unknown resource fails at hydration, before data movement
            with pytest.raises(errs):
                read_stream(proxy.location,
                            {"source": "ghost", "variant": "v1",
                             "resourceType": "source"})
            # limit hydration defaults + clamps
            rows = read_stream(
                proxy.location,
                {"source": "clicks", "variant": "v1",
                 "resourceType": "source", "limit": 7},
            )
            assert len(rows) == 7
