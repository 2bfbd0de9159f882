"""End-to-end vector database demo.

Starts the wire-compatible EmbeddingHub server in-process, drives it
through the reference-parity SDK: create_space -> multiset ->
nearest_neighbor -> freeze -> download.

Run:  python examples/vector_db_demo.py
"""

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from embeddinghub_tpu.sdk.client import EmbeddingHubClient
from embeddinghub_tpu.service.server import build_server


def main():
    server, service = build_server("127.0.0.1:0", data_dir=None)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    print(f"server on :{port}")

    client = EmbeddingHubClient(port=port)
    rng = np.random.default_rng(0)

    client.create_space("movies", dims=64)
    vectors = {f"movie-{i}": rng.standard_normal(64).tolist() for i in range(5000)}
    client.multiset("movies", vectors)
    print("inserted", len(vectors), "embeddings")

    picks = client.nearest_neighbor("movies", 5, key="movie-42")
    print("nearest to movie-42:", list(picks))

    by_vector = client.nearest_neighbor("movies", 3, embedding=vectors["movie-7"])
    print("nearest to movie-7's vector:", list(by_vector))

    client.freeze_space("movies")
    try:
        client.set("movies", "new", [0.0] * 64)
    except TypeError as e:
        print("frozen space rejects writes:", e)

    n = sum(1 for _ in client.download("movies"))
    print("download streamed", n, "records")

    client.close()
    server.stop(0)
    service.stop()


if __name__ == "__main__":
    main()
