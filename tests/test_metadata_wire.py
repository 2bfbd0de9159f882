"""Wire-parity proof for the Metadata service: register and fetch
resources against OUR server using message classes compiled from the
REFERENCE's own metadata.proto (same pattern as test_wire_compat.py).

Covers the VERDICT r1 item 5 'done' criterion: a stub generated from
/root/reference/metadata/proto/metadata.proto can register and fetch a
feature against this package's server — typed messages, no pickle on
the wire.
"""

import os
import shutil
import subprocess
import sys
from concurrent import futures

import grpc
import pytest

REF_PROTO = "/root/reference/metadata/proto/metadata.proto"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_PROTO) and shutil.which("protoc")),
    reason="reference proto or protoc unavailable",
)


@pytest.fixture(scope="module")
def ref_pb(tmp_path_factory):
    d = tmp_path_factory.mktemp("refmetaproto")
    proto = d / "ref_metadata.proto"
    text = open(REF_PROTO).read()
    # Rename the package for the in-process copy (our own compiled copy
    # of the same file is already registered in the descriptor pool);
    # package name does not affect message wire bytes.  Method paths are
    # built manually below with the reference's real service name.
    text = text.replace(
        "package featureform.serving.metadata.proto;",
        "package refcheck.metadata.proto;",
    )
    proto.write_text(text)
    subprocess.run(
        ["protoc", f"--python_out={d}", "-I", str(d), proto.name],
        check=True,
    )
    sys.path.insert(0, str(d))
    try:
        import ref_metadata_pb2 as pb

        yield pb
    finally:
        sys.path.remove(str(d))


@pytest.fixture(scope="module")
def our_server():
    from embeddinghub_tpu.featurestore.metadata import MetadataStore
    from embeddinghub_tpu.featurestore.metadata_wire import (
        MetadataWireService,
        register,
    )

    from embeddinghub_tpu.featurestore.api_wire import ApiWireService
    from embeddinghub_tpu.featurestore.api_wire import (
        register as register_api,
    )

    store = MetadataStore()
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
    register(MetadataWireService(store), server)
    register_api(ApiWireService(store), server)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    yield f"127.0.0.1:{port}", store
    server.stop(0)


_SVC = "/featureform.serving.metadata.proto.Metadata"


def _uu(channel, name, pb_req, pb_resp):
    return channel.unary_unary(
        f"{_SVC}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def _ss(channel, name, pb_req, pb_resp):
    return channel.stream_stream(
        f"{_SVC}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def _us(channel, name, pb_req, pb_resp):
    return channel.unary_stream(
        f"{_SVC}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def test_register_and_fetch_feature_via_reference_stub(ref_pb, our_server):
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    # --- register: user, provider, source, entity, feature ---
    _uu(chan, "CreateUser", pb.UserRequest, pb.Empty)(
        pb.UserRequest(user=pb.User(name="alice"))
    )
    _uu(chan, "CreateProvider", pb.ProviderRequest, pb.Empty)(
        pb.ProviderRequest(
            provider=pb.Provider(
                name="tpu-store",
                type="EMBEDDINGHUB_TPU",
                software="embeddinghub_tpu",
                serialized_config=b'{"host": "localhost"}',
            )
        )
    )
    _uu(chan, "CreateEntity", pb.EntityRequest, pb.Empty)(
        pb.EntityRequest(entity=pb.Entity(name="user_id"))
    )
    sv = pb.SourceVariant(
        name="clicks", variant="v1", owner="alice", provider="tpu-store"
    )
    sv.primaryData.table.name = "clicks_raw"
    _uu(chan, "CreateSourceVariant", pb.SourceVariantRequest, pb.Empty)(
        pb.SourceVariantRequest(source_variant=sv)
    )
    fv = pb.FeatureVariant(
        name="click_count",
        variant="v1",
        source=pb.NameVariant(name="clicks", variant="v1"),
        entity="user_id",
        owner="alice",
        provider="tpu-store",
    )
    fv.columns.entity = "user_id"
    fv.columns.value = "clicks"
    fv.columns.ts = "ts"
    fv.type.scalar = pb.ScalarType.INT64
    _uu(chan, "CreateFeatureVariant", pb.FeatureVariantRequest, pb.Empty)(
        pb.FeatureVariantRequest(feature_variant=fv)
    )

    # --- fetch back through the typed surface ---
    got = list(
        _ss(chan, "GetFeatureVariants", pb.NameVariantRequest, pb.FeatureVariant)(
            iter(
                [
                    pb.NameVariantRequest(
                        name_variant=pb.NameVariant(
                            name="click_count", variant="v1"
                        )
                    )
                ]
            )
        )
    )
    assert len(got) == 1
    g = got[0]
    assert g.name == "click_count" and g.variant == "v1"
    assert g.source.name == "clicks" and g.source.variant == "v1"
    assert g.columns.entity == "user_id" and g.columns.value == "clicks"
    assert g.type.scalar == pb.ScalarType.INT64
    assert g.mode == pb.ComputationMode.PRECOMPUTED

    feats = list(
        _us(chan, "ListFeatures", pb.ListRequest, pb.Feature)(pb.ListRequest())
    )
    assert [f.name for f in feats] == ["click_count"]
    assert feats[0].variants == ["v1"]

    srcs = list(
        _ss(chan, "GetSourceVariants", pb.NameVariantRequest, pb.SourceVariant)(
            iter(
                [
                    pb.NameVariantRequest(
                        name_variant=pb.NameVariant(name="clicks", variant="v1")
                    )
                ]
            )
        )
    )
    assert srcs[0].primaryData.table.name == "clicks_raw"

    provs = list(
        _ss(chan, "GetProviders", pb.NameRequest, pb.Provider)(
            iter([pb.NameRequest(name=pb.Name(name="tpu-store"))])
        )
    )
    assert provs[0].type == "EMBEDDINGHUB_TPU"
    assert b"localhost" in provs[0].serialized_config

    users = list(
        _ss(chan, "GetUsers", pb.NameRequest, pb.User)(
            iter([pb.NameRequest(name=pb.Name(name="alice"))])
        )
    )
    assert users[0].name == "alice"


def test_equivalence_and_conflict_via_reference_stub(ref_pb, our_server):
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    sv = pb.SourceVariant(name="orders", variant="v1", owner="alice")
    sv.primaryData.table.name = "orders_raw"
    create = _uu(chan, "CreateSourceVariant", pb.SourceVariantRequest, pb.Empty)
    create(pb.SourceVariantRequest(source_variant=sv))
    # identical re-registration: no-op, no error
    create(pb.SourceVariantRequest(source_variant=sv))
    # conflicting re-registration: ALREADY_EXISTS
    sv2 = pb.SourceVariant(name="orders", variant="v1", owner="alice")
    sv2.primaryData.table.name = "DIFFERENT"
    with pytest.raises(grpc.RpcError) as exc:
        create(pb.SourceVariantRequest(source_variant=sv2))
    assert exc.value.code() == grpc.StatusCode.ALREADY_EXISTS

    # GetEquivalent finds the stored variant
    req = pb.GetEquivalentRequest()
    req.variant.source_variant.CopyFrom(sv)
    eq = _uu(chan, "GetEquivalent", pb.GetEquivalentRequest, pb.ResourceVariant)(req)
    assert eq.WhichOneof("resource") == "source_variant"
    assert eq.source_variant.name == "orders"

    # unknown variant -> NOT_FOUND on Get
    with pytest.raises(grpc.RpcError) as exc:
        list(
            _ss(chan, "GetSourceVariants", pb.NameVariantRequest, pb.SourceVariant)(
                iter(
                    [
                        pb.NameVariantRequest(
                            name_variant=pb.NameVariant(name="nope", variant="v9")
                        )
                    ]
                )
            )
        )
    assert exc.value.code() == grpc.StatusCode.NOT_FOUND


def test_sql_transform_and_training_set_round_trip(ref_pb, our_server):
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    tf = pb.SourceVariant(name="agg", variant="v1", owner="alice")
    tf.transformation.SQLTransformation.query = (
        "SELECT user, COUNT(*) FROM {{ clicks.v1 }} GROUP BY user"
    )
    tf.transformation.SQLTransformation.source.add(name="clicks", variant="v1")
    _uu(chan, "CreateSourceVariant", pb.SourceVariantRequest, pb.Empty)(
        pb.SourceVariantRequest(source_variant=tf)
    )
    got = list(
        _ss(chan, "GetSourceVariants", pb.NameVariantRequest, pb.SourceVariant)(
            iter(
                [
                    pb.NameVariantRequest(
                        name_variant=pb.NameVariant(name="agg", variant="v1")
                    )
                ]
            )
        )
    )
    assert "GROUP BY" in got[0].transformation.SQLTransformation.query
    assert got[0].transformation.SQLTransformation.source[0].name == "clicks"

    lv = pb.LabelVariant(
        name="churned", variant="v1", owner="alice", entity="user_id",
        source=pb.NameVariant(name="clicks", variant="v1"),
    )
    lv.entity_mappings.value_column = "churned"
    lv.entity_mappings.timestamp_column = "ts"
    lv.entity_mappings.mappings.add(name="user_id", entity_column="user")
    _uu(chan, "CreateLabelVariant", pb.LabelVariantRequest, pb.Empty)(
        pb.LabelVariantRequest(label_variant=lv)
    )
    ts = pb.TrainingSetVariant(
        name="churn_model_data", variant="v1", owner="alice",
        label=pb.NameVariant(name="churned", variant="v1"),
    )
    ts.features.add(name="click_count", variant="v1")
    fl = ts.feature_lags.add(
        feature="click_count", variant="v1", name="clicks_1h_ago"
    )
    fl.lag.seconds = 3600
    _uu(chan, "CreateTrainingSetVariant", pb.TrainingSetVariantRequest, pb.Empty)(
        pb.TrainingSetVariantRequest(training_set_variant=ts)
    )
    back = list(
        _ss(
            chan,
            "GetTrainingSetVariants",
            pb.NameVariantRequest,
            pb.TrainingSetVariant,
        )(
            iter(
                [
                    pb.NameVariantRequest(
                        name_variant=pb.NameVariant(
                            name="churn_model_data", variant="v1"
                        )
                    )
                ]
            )
        )
    )
    assert back[0].label.name == "churned"
    assert back[0].features[0].name == "click_count"
    assert back[0].feature_lags[0].feature == "click_count"
    assert back[0].feature_lags[0].name == "clicks_1h_ago"
    assert back[0].feature_lags[0].lag.seconds == 3600

    # nothing pickled anywhere in the store
    from embeddinghub_tpu.featurestore.resources import SourceVariant

    stored = [r for r in store.all() if isinstance(r, SourceVariant)]
    assert stored, "source variants should be real dataclasses in the store"


_API = "/featureform.serving.metadata.proto.Api"


def _su(channel, name, pb_req, pb_resp):
    return channel.stream_unary(
        f"{_API}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def _api_uu(channel, name, pb_req, pb_resp):
    return channel.unary_unary(
        f"{_API}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def test_write_features_and_labels_via_reference_stub(ref_pb, our_server):
    """WriteFeatures/WriteLabels streaming writes (reference
    api/api.go:1150-1229): each record lands in the offline source
    table AND (features) the online table."""
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    _uu(chan, "CreateProvider", pb.ProviderRequest, pb.Empty)(
        pb.ProviderRequest(provider=pb.Provider(
            name="online-mem", type="MEMORY_ONLINE", serialized_config=b"{}",
        ))
    )
    _uu(chan, "CreateProvider", pb.ProviderRequest, pb.Empty)(
        pb.ProviderRequest(provider=pb.Provider(
            name="offline-pd", type="PANDAS_OFFLINE", serialized_config=b"{}",
        ))
    )
    sv = pb.SourceVariant(
        name="events", variant="s1", owner="alice", provider="offline-pd"
    )
    sv.primaryData.table.name = "events_raw"
    _uu(chan, "CreateSourceVariant", pb.SourceVariantRequest, pb.Empty)(
        pb.SourceVariantRequest(source_variant=sv)
    )
    fv = pb.FeatureVariant(
        name="score", variant="s1", owner="alice", entity="user",
        source=pb.NameVariant(name="events", variant="s1"),
        provider="online-mem",
    )
    fv.columns.entity = "user"
    fv.columns.value = "score"
    fv.columns.ts = "ts"
    fv.type.scalar = pb.ScalarType.INT64
    _uu(chan, "CreateFeatureVariant", pb.FeatureVariantRequest, pb.Empty)(
        pb.FeatureVariantRequest(feature_variant=fv)
    )

    recs = [
        pb.StreamingFeatureVariant(
            name="score", variant="s1", entity="u1", value="7"
        ),
        pb.StreamingFeatureVariant(
            name="score", variant="s1", entity="u2", value="9"
        ),
        pb.StreamingFeatureVariant(
            name="score", variant="s1", entity="u1", value="11"
        ),
    ]
    _su(chan, "WriteFeatures", pb.StreamingFeatureVariant, pb.Empty)(
        iter(recs)
    )

    # online: latest value per entity, typed per the variant
    from embeddinghub_tpu.featurestore.providers.base import get_provider

    online = get_provider("MEMORY_ONLINE", {}, cache_key="online-mem")
    table = online.as_online_store().get_table("score", "s1")
    assert table.get("u1") == 11 and table.get("u2") == 9

    # offline: ALL streamed rows appended to the source table
    offline = get_provider(
        "PANDAS_OFFLINE", {}, cache_key="offline-pd"
    ).as_offline_store()
    rows = offline.table_rows("events", "s1")
    assert [(r["user"], r["score"]) for r in rows] == [
        ("u1", 7), ("u2", 9), ("u1", 11)
    ]

    # labels: offline append only
    lv = pb.LabelVariant(
        name="clicked", variant="s1", owner="alice", entity="user",
        source=pb.NameVariant(name="events", variant="s1"),
    )
    lv.entity_mappings.value_column = "clicked"
    lv.entity_mappings.mappings.add(name="user", entity_column="user")
    _uu(chan, "CreateLabelVariant", pb.LabelVariantRequest, pb.Empty)(
        pb.LabelVariantRequest(label_variant=lv)
    )
    _su(chan, "WriteLabels", pb.StreamingLabelVariant, pb.Empty)(
        iter([pb.StreamingLabelVariant(
            name="clicked", variant="s1", entity="u1", value="true"
        )])
    )
    rows = offline.table_rows("events", "s1")
    assert any(r.get("clicked") for r in rows)

    # unknown feature -> NOT_FOUND
    with pytest.raises(grpc.RpcError) as exc:
        _su(chan, "WriteFeatures", pb.StreamingFeatureVariant, pb.Empty)(
            iter([pb.StreamingFeatureVariant(name="nope", variant="s1")])
        )
    assert exc.value.code() == grpc.StatusCode.NOT_FOUND


def test_staged_deletion_via_reference_stub(ref_pb, our_server):
    """MarkForDeletion stages; GetStagedForDeletionResource reads the
    staged copy (metadata.go:2558); FinalizeDeletion drops it."""
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    sv = pb.SourceVariant(name="doomed", variant="v1", owner="alice")
    sv.primaryData.table.name = "doomed_raw"
    _uu(chan, "CreateSourceVariant", pb.SourceVariantRequest, pb.Empty)(
        pb.SourceVariantRequest(source_variant=sv)
    )

    rid = pb.ResourceID(
        resource=pb.NameVariant(name="doomed", variant="v1"),
        resource_type=pb.ResourceType.SOURCE_VARIANT,
    )
    _uu(chan, "MarkForDeletion", pb.MarkForDeletionRequest,
        pb.MarkForDeletionResponse)(
        pb.MarkForDeletionRequest(resource_id=rid)
    )

    # live namespace no longer sees it
    with pytest.raises(grpc.RpcError) as exc:
        list(_ss(chan, "GetSourceVariants", pb.NameVariantRequest,
                 pb.SourceVariant)(
            iter([pb.NameVariantRequest(
                name_variant=pb.NameVariant(name="doomed", variant="v1")
            )])
        ))
    assert exc.value.code() == grpc.StatusCode.NOT_FOUND

    # ... but the staged copy is readable
    staged = _uu(chan, "GetStagedForDeletionResource",
                 pb.GetStagedForDeletionResourceRequest,
                 pb.GetStagedForDeletionResourceResponse)(
        pb.GetStagedForDeletionResourceRequest(resource_id=rid)
    )
    got = staged.resource_variant
    assert got.WhichOneof("resource") == "source_variant"
    assert got.source_variant.name == "doomed"
    assert got.source_variant.primaryData.table.name == "doomed_raw"

    _uu(chan, "FinalizeDeletion", pb.FinalizeDeletionRequest,
        pb.FinalizeDeletionResponse)(
        pb.FinalizeDeletionRequest(resource_id=rid)
    )
    with pytest.raises(grpc.RpcError) as exc:
        _uu(chan, "GetStagedForDeletionResource",
            pb.GetStagedForDeletionResourceRequest,
            pb.GetStagedForDeletionResourceResponse)(
            pb.GetStagedForDeletionResourceRequest(resource_id=rid)
        )
    assert exc.value.code() == grpc.StatusCode.NOT_FOUND


def test_conflict_reports_field_diff(ref_pb, our_server):
    """A conflicting re-registration names the differing fields
    (reference equivalence package, source_variant.go:337)."""
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    sv = pb.SourceVariant(name="diffsrc", variant="v1", owner="alice")
    sv.primaryData.table.name = "original"
    create = _uu(chan, "CreateSourceVariant", pb.SourceVariantRequest, pb.Empty)
    create(pb.SourceVariantRequest(source_variant=sv))
    sv2 = pb.SourceVariant(name="diffsrc", variant="v1", owner="alice")
    sv2.primaryData.table.name = "changed"
    with pytest.raises(grpc.RpcError) as exc:
        create(pb.SourceVariantRequest(source_variant=sv2))
    assert exc.value.code() == grpc.StatusCode.ALREADY_EXISTS
    assert "differing fields" in exc.value.details()
    assert "primary" in exc.value.details()


def test_api_service_proxies_metadata_surface(ref_pb, our_server):
    """The Api service answers the shared Metadata method set on its
    own paths (reference clients talk to the Api gateway, not metadata
    directly)."""
    pb = ref_pb
    addr, store = our_server
    chan = grpc.insecure_channel(addr)

    _api_uu(chan, "CreateUser", pb.UserRequest, pb.Empty)(
        pb.UserRequest(user=pb.User(name="via-api"))
    )
    got = list(chan.stream_stream(
        f"{_API}/GetUsers",
        request_serializer=pb.NameRequest.SerializeToString,
        response_deserializer=pb.User.FromString,
    )(iter([pb.NameRequest(name=pb.Name(name="via-api"))])))
    assert got[0].name == "via-api"
