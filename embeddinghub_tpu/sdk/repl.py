"""Tiny interactive REPL against a running EmbeddingHub server.

Parity with reference ``sdk/python/repl.py``: stdin command loop
supporting create / set / get / nn.

Usage:  python -m embeddinghub_tpu.sdk.repl [host] [port]
Commands:
    create <space> <dims>
    set <space> <key> <v1> <v2> ...
    get <space> <key>
    nn <space> <key> <num>
    quit
"""

from __future__ import annotations

import sys

from embeddinghub_tpu.sdk.client import EmbeddingHubClient


def run(host: str = "0.0.0.0", port: int = 7462) -> None:
    client = EmbeddingHubClient(host=host, port=port)
    print("embeddinghub-tpu repl; commands: create/set/get/nn/quit")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            continue
        cmd, *args = line.split()
        try:
            if cmd == "quit":
                break
            elif cmd == "create":
                client.create_space(args[0], int(args[1]))
                print("ok")
            elif cmd == "set":
                client.set(args[0], args[1], [float(v) for v in args[2:]])
                print("ok")
            elif cmd == "get":
                print(list(client.get(args[0], args[1])))
            elif cmd == "nn":
                print(list(client.nearest_neighbor(args[0], int(args[2]), key=args[1])))
            else:
                print(f"unknown command: {cmd}")
        except Exception as e:  # keep the loop alive on user error
            print(f"error: {e}")
    client.close()


if __name__ == "__main__":
    host = sys.argv[1] if len(sys.argv) > 1 else "0.0.0.0"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 7462
    run(host, port)
