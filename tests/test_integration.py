"""SDK <-> server integration tests.

Mirrors reference ``embeddinghub/test/integration.py``: spawn the real
server as a subprocess on a random port, drive it with the SDK
(set/get/multiset/multiget/freeze/download/multi-space/NN).
"""

import os
import random
import subprocess
import sys
import time
import uuid

import grpc
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    port = random.randint(20000, 40000)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon plugin
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/ehtpu_jax_cache"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    data_dir = str(tmp_path_factory.mktemp("server_store"))
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "embeddinghub_tpu.service.server",
            f"0.0.0.0:{port}",
            data_dir,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    # wait for readiness line
    deadline = time.time() + 60
    while time.time() < deadline:
        line = proc.stdout.readline().decode()
        if "listening" in line:
            break
        if proc.poll() is not None:
            raise RuntimeError(f"server died: {proc.stdout.read().decode()}")
    else:
        proc.kill()
        raise RuntimeError("server did not start in time")
    # Drain the pipe forever: XLA/jax can log kilobytes per cache load;
    # an undrained 64 KB pipe blocks the server's writes and deadlocks
    # whichever test is in flight.
    import threading

    threading.Thread(
        target=lambda: [None for _ in iter(proc.stdout.readline, b"")],
        daemon=True,
    ).start()
    yield port
    proc.kill()
    proc.wait()


@pytest.fixture
def client(server_port):
    from embeddinghub_tpu.sdk.client import EmbeddingHubClient

    c = EmbeddingHubClient(port=server_port)
    yield c
    c.close()


def test_set_get(client):
    space = uuid.uuid4()
    client.create_space(space, 3)
    client.set(space, "a", [1, 2, 3])
    assert list(client.get(space, "a")) == [1, 2, 3]


def test_immutable_set(client):
    space = uuid.uuid4()
    client.create_space(space, 3)
    client.set(space, "a", [1, 2, 3])
    client.freeze_space(space)
    with pytest.raises(TypeError):
        client.set(space, "a", [1, 2, 3])


def test_multiset_get(client):
    space = uuid.uuid4()
    embs = {"a": [1, 2, 3], "b": [3, 2, 1]}
    client.create_space(space, 3)
    client.multiset(space, embs)
    for key, emb in embs.items():
        assert list(client.get(space, key)) == emb


def test_multiset_multiget(client):
    space = uuid.uuid4()
    embs = {"a": [1, 2, 3], "b": [3, 2, 1]}
    client.create_space(space, 3)
    client.multiset(space, embs)
    got = {k: list(v) for k, v in zip(embs, client.multiget(space, embs.keys()))}
    assert got == embs


def test_multi_space(client):
    embs = {"s1": [1, 2, 3], "s2": [3, 2, 1]}
    for space in embs:
        client.create_space(space, 3)
    for space, emb in embs.items():
        client.set(space, "key", emb)
    for space, emb in embs.items():
        assert list(client.get(space, "key")) == emb


def test_multiset_download(client):
    space = uuid.uuid4()
    embs = {"a": [1, 2, 3], "b": [3, 2, 1]}
    client.create_space(space, 3)
    client.multiset(space, embs)
    got = {k: list(v) for k, v in client.download(space)}
    assert got == embs


def test_nearest_neighbor_keyed_and_vector(client):
    space = uuid.uuid4()
    client.create_space(space, 2)
    client.multiset(
        space, {"a": [0, 0], "b": [1, 0], "c": [5, 5], "d": [-1, 0]}
    )
    assert list(client.nearest_neighbor(space, 2, key="a")) in (
        ["b", "d"],
        ["d", "b"],
    )
    assert list(client.nearest_neighbor(space, 1, embedding=[4.9, 4.9])) == ["c"]


def test_nearest_neighbor_validation(client):
    space = uuid.uuid4()
    client.create_space(space, 2)
    client.set(space, "a", [0, 0])
    with pytest.raises(grpc.RpcError) as e:
        client.nearest_neighbor(space, 1, key="a", embedding=[1.0, 0.0])
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    with pytest.raises(grpc.RpcError) as e:
        client.nearest_neighbor(space, 1)
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_missing_space_not_found(client):
    with pytest.raises(grpc.RpcError) as e:
        client.get("no-such-space", "k")
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_delete_space(client):
    space = uuid.uuid4()
    client.create_space(space, 2)
    client.set(space, "a", [1, 1])
    client.delete_space(space)
    with pytest.raises(grpc.RpcError) as e:
        client.get(space, "a")
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_async_futures(client):
    space = uuid.uuid4()
    client.create_space(space, 2)
    fut = client.set(space, "a", [1, 1], wait=False)
    fut.result()
    get_fut = client.get(space, "a", wait=False)
    assert list(get_fut.result()) == [1, 1]


def test_concurrent_insert_and_query(client):
    """BASELINE config-5 capability: streaming batched inserts while
    queries run (the reference serializes everything behind one mutex;
    here writers take the per-version lock and readers hit consistent
    device snapshots)."""
    import threading

    import numpy as np

    space = uuid.uuid4()
    client.create_space(space, 8)
    rng = np.random.default_rng(11)
    base = rng.standard_normal((100, 8)).astype(np.float32)
    client.multiset(space, {f"b{i}": base[i].tolist() for i in range(100)})

    errors = []

    def writer():
        try:
            for wave in range(5):
                client.multiset(
                    space,
                    {
                        f"w{wave}_{i}": rng.standard_normal(8).tolist()
                        for i in range(50)
                    },
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t = threading.Thread(target=writer)
    t.start()
    try:
        for i in range(30):
            got = client.nearest_neighbor(space, 3, embedding=base[i % 100].tolist())
            assert len(got) == 3
    finally:
        t.join()
    assert not errors
    # all writes landed and are queryable
    assert list(client.get(space, "w4_49")) is not None
    found = client.nearest_neighbor(space, 1, key="w4_49")
    assert len(found) == 1


def test_concurrent_nearest_neighbor(client):
    """Many threads issuing NN at once — exercises the batching front."""
    from concurrent.futures import ThreadPoolExecutor

    space = uuid.uuid4()
    client.create_space(space, 4)
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = {f"k{i}": rng.standard_normal(4).tolist() for i in range(200)}
    client.multiset(space, vecs)

    def query(i):
        return list(client.nearest_neighbor(space, 1, embedding=vecs[f"k{i}"]))

    with ThreadPoolExecutor(16) as ex:
        results = list(ex.map(query, range(100)))
    assert all(results[i] == [f"k{i}"] for i in range(100))


def test_batch_nearest_neighbor_rpc(client):
    """Extension RPC: whole batch in one round trip."""
    import numpy as np

    space = uuid.uuid4()
    client.create_space(space, 8)
    rng = np.random.default_rng(5)
    vecs = {f"k{i}": rng.standard_normal(8).tolist() for i in range(100)}
    client.multiset(space, vecs)
    # by embeddings
    got = client.nearest_neighbor_batch(
        space, 1, embeddings=[vecs["k3"], vecs["k7"]]
    )
    assert got == [["k3"], ["k7"]]
    # by keys (self-excluded)
    got = client.nearest_neighbor_batch(space, 2, keys=["k3", "k7"])
    assert all(len(g) == 2 for g in got)
    assert "k3" not in got[0] and "k7" not in got[1]
    # validation: both/none
    with pytest.raises(grpc.RpcError) as e:
        client.nearest_neighbor_batch(space, 1)
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    with pytest.raises(grpc.RpcError) as e:
        client.nearest_neighbor_batch(
            space, 1, keys=["k1"], embeddings=[vecs["k1"]]
        )
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
