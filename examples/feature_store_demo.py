"""End-to-end feature store demo: register -> apply -> serve ->
training set -> ANN over the TPU engine vector store.

Run:  python examples/feature_store_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import embeddinghub_tpu.featurestore as ff


def main():
    rng = np.random.default_rng(0)
    rows = [
        {
            "user_id": f"u{i}",
            "clicks": int(rng.integers(0, 100)),
            "embedding": rng.standard_normal(32).tolist(),
            "bought": int(rng.integers(0, 2)),
            "ts": 1,
        }
        for i in range(200)
    ]

    reg = ff.global_registrar()
    reg.reset()
    reg.register_user("demo")
    reg.set_default_owner("demo")
    reg.register_sqlite_offline("warehouse")
    reg.register_memory_online("cache")
    reg.register_engine_vector_store("vectors")   # the TPU engine
    reg.register_entity("user")
    reg.register_primary_data("events", provider="warehouse", location={"rows": rows})

    @reg.sql_transformation(name="engaged", provider="warehouse",
                            inputs=[("events", "default")])
    def engaged():
        return "SELECT user_id, clicks * 2 AS score, ts FROM {{ events.default }}"

    reg.register_feature("score", source=("engaged", "default"), entity="user",
                         entity_column="user_id", value_column="score",
                         provider="cache")
    reg.register_embedding_feature("user_vec", source=("events", "default"),
                                   entity="user", entity_column="user_id",
                                   value_column="embedding", dims=32,
                                   provider="vectors")
    reg.register_label("bought", source=("events", "default"), entity="user",
                       entity_column="user_id", value_column="bought")
    reg.register_training_set("purchase_model", label=("bought", "default"),
                              features=[("score", "default")])

    client = ff.Client()
    client.apply()
    print("applied; score(u7) =", client.features(["score"], {"user": "u7"}))

    # pandas dataframe() over a registered source (client.py:123 parity)
    df = client.dataframe("events")
    print("events dataframe:", getattr(df, "shape", len(df)))

    hits = client.nearest("user_vec", "default", rows[3]["embedding"], 3)
    print("3-NN of u3's embedding:", hits)

    ds = client.training_set("purchase_model").shuffle(64, seed=0).batch(32)
    n = sum(len(b) for b in ds)
    print("training rows streamed:", n)


if __name__ == "__main__":
    main()
