"""Provider behavioral contract suite.

The reference runs one behavioral suite against every provider
implementation (``provider/unit_test_store.go:342``, ``offline_test.go``,
``online_test.go``); this is that pattern: the same assertions run
against every registered provider type, so a new provider must pass the
identical contract the in-process ones do.

Providers covered here:
  * MEMORY_ONLINE       (in-process dict)
  * REDIS_ONLINE        (RESP wire against the in-process RESP fake)
  * EMBEDDINGHUB_TPU    (vector store on the engine)
  * SQLITE_OFFLINE      (offline contract, SQL engine)
  * PANDAS_OFFLINE      (offline contract, pandas + jsonl filestore)
"""

import numpy as np
import pytest

from embeddinghub_tpu.featurestore import fferr
from embeddinghub_tpu.featurestore.providers import base, get_provider
from embeddinghub_tpu.featurestore.providers.redis_fake import FakeRedisServer

# imports register the factories
import embeddinghub_tpu.featurestore.providers.memory_online  # noqa: F401
import embeddinghub_tpu.featurestore.providers.engine_vector  # noqa: F401
import embeddinghub_tpu.featurestore.providers.redis_online  # noqa: F401
import embeddinghub_tpu.featurestore.providers.sqlite_offline  # noqa: F401
import embeddinghub_tpu.featurestore.providers.pandas_offline  # noqa: F401
import embeddinghub_tpu.featurestore.providers.sqlite_online  # noqa: F401


@pytest.fixture(scope="module")
def fake_redis():
    with FakeRedisServer() as srv:
        yield srv


def _online_providers(fake_redis):
    return [
        ("MEMORY_ONLINE", {}),
        ("REDIS_ONLINE", {"host": fake_redis.host, "port": fake_redis.port}),
        ("SQLITE_ONLINE", {}),
    ]


@pytest.fixture(params=["MEMORY_ONLINE", "REDIS_ONLINE", "SQLITE_ONLINE"])
def online_store(request, fake_redis):
    cfgs = dict(_online_providers(fake_redis))
    p = get_provider(request.param, cfgs[request.param])
    yield p.as_online_store()


@pytest.fixture(params=["EMBEDDINGHUB_TPU", "REDIS_ONLINE"])
def vector_store(request, fake_redis):
    if request.param == "REDIS_ONLINE":
        p = get_provider(
            "REDIS_ONLINE", {"host": fake_redis.host, "port": fake_redis.port}
        )
    else:
        p = get_provider("EMBEDDINGHUB_TPU", {"metric": "cosine"})
    yield p


_N = [0]


def _fresh(prefix):
    _N[0] += 1
    return f"{prefix}{_N[0]}", "v1"


# ------------------------------------------------------------- online


class TestOnlineContract:
    def test_set_get_roundtrip(self, online_store):
        f, v = _fresh("feat")
        t = online_store.create_table(f, v, value_type="string")
        t.set("e1", "hello")
        assert t.get("e1") == "hello"

    def test_overwrite_latest_wins(self, online_store):
        f, v = _fresh("feat")
        t = online_store.create_table(f, v, value_type="int")
        t.set("e", 1)
        t.set("e", 2)
        assert int(t.get("e")) == 2

    def test_missing_entity_raises(self, online_store):
        f, v = _fresh("feat")
        t = online_store.create_table(f, v, value_type="string")
        with pytest.raises(fferr.FFError):
            t.get("nope")

    def test_batch_set(self, online_store):
        f, v = _fresh("feat")
        t = online_store.create_table(f, v, value_type="int")
        t.batch_set([(f"e{i}", i) for i in range(20)])
        assert int(t.get("e7")) == 7

    def test_get_table_after_create(self, online_store):
        f, v = _fresh("feat")
        online_store.create_table(f, v, value_type="string").set("a", "x")
        t2 = online_store.get_table(f, v)
        assert t2.get("a") == "x"

    def test_missing_table_raises(self, online_store):
        with pytest.raises(fferr.FFError):
            online_store.get_table("never_created", "v0")

    def test_typed_values(self, online_store):
        f, v = _fresh("feat")
        t = online_store.create_table(f, v, value_type="float32")
        t.set("e", 2.5)
        assert float(t.get("e")) == 2.5

    def test_health(self, online_store):
        assert online_store.check_health() in (True, False)


# ------------------------------------------------------------- vector


class TestVectorContract:
    def test_index_set_nearest(self, vector_store):
        f, v = _fresh("emb")
        tbl = vector_store.create_index(f, v, dims=8)
        rng = np.random.default_rng(3)
        base_vecs = {}
        for i in range(32):
            vec = rng.standard_normal(8).astype(np.float32)
            base_vecs[f"e{i}"] = vec
            tbl.set(f"e{i}", [float(x) for x in vec])
        # query very close to e5 must return e5 first
        q = base_vecs["e5"] + 1e-4
        got = tbl.nearest(f, v, [float(x) for x in q], 3)
        assert got[0] == "e5"
        assert len(got) == 3

    def test_vector_get_roundtrip(self, vector_store):
        f, v = _fresh("emb")
        tbl = vector_store.create_index(f, v, dims=4)
        tbl.set("a", [1.0, 2.0, 3.0, 4.0])
        got = np.asarray(tbl.get("a"), dtype=np.float32)
        # cosine-backed engines may store normalized copies but must
        # return the direction intact
        got_dir = got / np.linalg.norm(got)
        want_dir = np.asarray([1, 2, 3, 4.0]) / np.linalg.norm([1, 2, 3, 4.0])
        assert np.allclose(got_dir, want_dir, atol=1e-5)

    def test_missing_entity_raises(self, vector_store):
        f, v = _fresh("emb")
        tbl = vector_store.create_index(f, v, dims=4)
        with pytest.raises(fferr.FFError):
            tbl.get("absent")

    def test_nearest_scoped_to_index(self, vector_store):
        f1, v1 = _fresh("emb")
        f2, v2 = _fresh("emb")
        t1 = vector_store.create_index(f1, v1, dims=4)
        t2 = vector_store.create_index(f2, v2, dims=4)
        t1.set("in_first", [1.0, 0.0, 0.0, 0.0])
        t2.set("in_second", [1.0, 0.0, 0.0, 0.0])
        got = t1.nearest(f1, v1, [1.0, 0.0, 0.0, 0.0], 5)
        assert "in_second" not in got


# ------------------------------------------------------------ offline


@pytest.fixture(params=["SQLITE_OFFLINE", "PANDAS_OFFLINE"])
def offline_store(request, tmp_path):
    if request.param == "PANDAS_OFFLINE":
        p = get_provider(request.param, {"path": str(tmp_path / "pands")},
                         cache_key=str(tmp_path))
    else:
        p = get_provider(request.param, {"path": str(tmp_path / "off.db")})
    yield p.as_offline_store()


class TestOfflineContract:
    def test_primary_write_read(self, offline_store):
        rows = [{"user": f"u{i}", "clicks": i, "ts": i} for i in range(10)]
        offline_store.register_primary("src", "v1", {"rows": rows})
        back = offline_store.table_rows("src", "v1")
        assert len(back) == 10
        assert {r["user"] for r in back} == {f"u{i}" for i in range(10)}

    def test_materialize_latest_per_entity(self, offline_store):
        offline_store.register_primary(
            "src2",
            "v1",
            {"rows": [
                {"user": "u1", "clicks": 1, "ts": 1},
                {"user": "u1", "clicks": 9, "ts": 5},
                {"user": "u2", "clicks": 3, "ts": 2},
            ]},
        )
        mat = offline_store.materialize("src2", "v1", "user", "clicks", "ts")
        got = dict(mat.rows())
        assert got == {"u1": 9, "u2": 3}
        assert mat.num_chunks() >= 1
        chunk0 = list(mat.iterate_chunk(0))
        assert set(dict(chunk0)) <= {"u1", "u2"}

    def test_sql_transformation(self, offline_store):
        offline_store.register_primary(
            "ev", "v1",
            {"rows": [{"user": "a", "n": 2}, {"user": "a", "n": 3},
                      {"user": "b", "n": 5}]},
        )
        offline_store.create_transformation(
            "agg",
            "v1",
            {"sql": "SELECT user, SUM(n) AS total FROM {{ ev.v1 }} GROUP BY user"},
            inputs=[("ev", "v1")],
        )
        rows = {r["user"]: r["total"] for r in offline_store.table_rows("agg", "v1")}
        assert rows == {"a": 5, "b": 5}


def test_pandas_offline_reopens_from_files(tmp_path):
    """Datasets are jsonl FILES: a fresh store instance over the same
    directory serves the same tables (the filestore-offline property the
    reference's Spark stores get from object storage)."""
    from embeddinghub_tpu.featurestore.providers.pandas_offline import (
        PandasOfflineStore,
    )

    s1 = PandasOfflineStore({"path": str(tmp_path)})
    s1.register_primary(
        "src", "v1", {"rows": [{"user": "a", "n": 1}, {"user": "b", "n": 2}]}
    )
    s1.create_transformation(
        "tot", "v1",
        {"sql": "SELECT user, SUM(n) AS t FROM {{ src.v1 }} GROUP BY user"},
        inputs=[("src", "v1")],
    )
    s2 = PandasOfflineStore({"path": str(tmp_path)})
    assert {r["user"] for r in s2.table_rows("src", "v1")} == {"a", "b"}
    assert {r["user"]: r["t"] for r in s2.table_rows("tot", "v1")} == {
        "a": 1, "b": 2,
    }
    mat = s2.materialize("src", "v1", "user", "n")
    assert dict(mat.rows()) == {"a": 1, "b": 2}
