"""TLS end-to-end: servers bind TLS when configured, clients verify it.

Reference parity: hosted featureform clients use TLS with an optional
self-signed root (client/src/featureform/register.py cert handling,
FEATUREFORM_CERT env); local mode stays plaintext like the C++ server's
insecure creds (embeddingstore/server.cc:249-268).
"""

from __future__ import annotations

import socket
import subprocess

import numpy as np
import pytest

from embeddinghub_tpu.sdk.client import EmbeddingHubClient
from embeddinghub_tpu.service.server import build_server


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def cert_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    crt, key = d / "server.crt", d / "server.key"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(crt),
            "-days", "1", "-nodes",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    return str(crt), str(key)


def test_tls_server_roundtrip(cert_pair, monkeypatch):
    crt, key = cert_pair
    monkeypatch.setenv("EHTPU_SERVER_CERT", crt)
    monkeypatch.setenv("EHTPU_SERVER_KEY", key)
    port = _free_port()
    server, service = build_server(f"localhost:{port}", data_dir=None)
    server.start()
    try:
        client = EmbeddingHubClient(
            host="localhost", port=port, insecure=False, cert_path=crt
        )
        client.create_space("tls_space", 4)
        client.set("tls_space", "a", [1.0, 0.0, 0.0, 0.0])
        got = client.get("tls_space", "a")
        np.testing.assert_allclose(got, [1.0, 0.0, 0.0, 0.0])
        client.close()
    finally:
        server.stop(0)
        service.stop()


def test_tls_rejects_plaintext_client(cert_pair, monkeypatch):
    crt, key = cert_pair
    monkeypatch.setenv("EHTPU_SERVER_CERT", crt)
    monkeypatch.setenv("EHTPU_SERVER_KEY", key)
    port = _free_port()
    server, service = build_server(f"localhost:{port}", data_dir=None)
    server.start()
    try:
        import grpc

        client = EmbeddingHubClient(host="localhost", port=port)  # plaintext
        with pytest.raises(grpc.RpcError):
            client.create_space("x", 4)
        client.close()
    finally:
        server.stop(0)
        service.stop()


def test_plaintext_default_unchanged():
    port = _free_port()
    server, service = build_server(f"localhost:{port}", data_dir=None)
    server.start()
    try:
        client = EmbeddingHubClient(host="localhost", port=port)
        client.create_space("plain", 4)
        client.close()
    finally:
        server.stop(0)
        service.stop()
