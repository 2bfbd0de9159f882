"""Single-process composer + hosted-mode remote client end-to-end."""

import os
import random
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def composer(tmp_path_factory):
    sp, fp, hp = (random.randint(20000, 40000) for _ in range(3))
    defs = tmp_path_factory.mktemp("defs") / "defs.py"
    defs.write_text(
        """
import embeddinghub_tpu.featurestore as ff
reg = ff.global_registrar()
reg.register_sqlite_offline("wh")
reg.register_memory_online("cache")
reg.register_engine_vector_store("vec")
reg.register_entity("user")
reg.register_primary_data("events", provider="wh", location={"rows": [
    {"user_id": "u1", "clicks": 10, "vec": [1.0, 0.0]},
    {"user_id": "u2", "clicks": 20, "vec": [0.0, 1.0]},
]})
reg.register_feature("clicks", source=("events", "default"), entity="user",
                     entity_column="user_id", value_column="clicks",
                     provider="cache")
reg.register_embedding_feature("uvec", source=("events", "default"),
                               entity="user", entity_column="user_id",
                               value_column="vec", dims=2, provider="vec")
reg.register_label("lbl", source=("events", "default"), entity="user",
                   entity_column="user_id", value_column="clicks")
reg.register_training_set("m", label=("lbl", "default"),
                          features=[("clicks", "default")])
"""
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/ehtpu_jax_cache"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    data_dir = str(tmp_path_factory.mktemp("store"))
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "embeddinghub_tpu.main",
            "--defs", str(defs),
            "--store-port", str(sp),
            "--serving-port", str(fp),
            "--http-port", str(hp),
            "--data-dir", data_dir,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        line = proc.stdout.readline().decode()
        if "embeddinghub-tpu up" in line:
            break
        if proc.poll() is not None:
            raise RuntimeError(proc.stdout.read().decode())
    else:
        proc.kill()
        raise RuntimeError("composer start timeout")
    # Drain the pipe forever (XLA logs can fill a 64 KB pipe and block
    # the composer's writes, deadlocking the test).
    import threading

    threading.Thread(
        target=lambda: [None for _ in iter(proc.stdout.readline, b"")],
        daemon=True,
    ).start()
    time.sleep(2)  # let coordinator finish task runs
    yield sp, fp, hp
    proc.kill()
    proc.wait()


def test_store_surface(composer):
    from embeddinghub_tpu.sdk.client import EmbeddingHubClient

    sp, _, _ = composer
    c = EmbeddingHubClient(port=sp)
    c.create_space("s", 3)
    c.set("s", "a", [1, 2, 3])
    assert list(c.get("s", "a")) == [1, 2, 3]
    c.close()


def test_remote_serving_client(composer):
    from embeddinghub_tpu.featurestore.remote_client import RemoteServingClient

    _, fp, _ = composer
    rc = RemoteServingClient(port=fp)
    assert rc.features(["clicks"], {"user": "u2"}) == [20]
    assert rc.nearest("uvec", "default", [0.9, 0.1], 1) == ["u1"]
    ds = rc.training_set("m")
    assert {(r.features()[0], r.label()) for r in ds} == {(10, 10), (20, 20)}
    rows = rc.source_data("events")
    assert len(rows) == 2
    train, test = rc.train_test_split("m", test_size=0.5)
    assert len(train) + len(test) == 2
    rc.close()


def test_dashboard_http(composer):
    import json
    import urllib.request

    _, _, hp = composer
    with urllib.request.urlopen(f"http://127.0.0.1:{hp}/data/features", timeout=10) as r:
        features = json.loads(r.read().decode())
    assert {f["name"] for f in features} == {"clicks", "uvec"}
