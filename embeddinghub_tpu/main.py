"""Single-process composer — start every service in one process.

Rebuild of reference ``main/main.go:37-235`` (one binary running API,
metadata, coordinator, dashboard HTTP, serving): here one process runs

  * the EmbeddingHub vector-store gRPC server   (default :7462)
  * the Feature serving gRPC server             (default :8081)
  * the dashboard/metadata HTTP API             (default :3001)
  * the coordinator poll loop

Usage:
    python -m embeddinghub_tpu.main [--defs definitions.py]
        [--store-port 7462] [--serving-port 8081] [--http-port 3001]
        [--data-dir embedding_store.dat] [--metadata-db state.db]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="embeddinghub-tpu")
    ap.add_argument("--defs", default=None, help="definitions .py to apply")
    ap.add_argument("--store-port", type=int, default=7462)
    ap.add_argument("--serving-port", type=int, default=8081)
    ap.add_argument("--metadata-port", type=int, default=8080)
    ap.add_argument("--http-port", type=int, default=3001)
    ap.add_argument("--data-dir", default="embedding_store.dat")
    ap.add_argument("--metadata-db", default=None)
    args = ap.parse_args(argv)

    import embeddinghub_tpu.featurestore as ff
    from embeddinghub_tpu.featurestore.dashboard import DashboardServer
    from embeddinghub_tpu.featurestore.logging import LOGGER
    from embeddinghub_tpu.featurestore.metadata import MetadataStore, SqliteStorage
    from embeddinghub_tpu.featurestore.serving_grpc import (
        build_server as build_serving,
    )
    from embeddinghub_tpu.service.server import build_server as build_store

    metadata = (
        MetadataStore(SqliteStorage(args.metadata_db))
        if args.metadata_db
        else MetadataStore()
    )
    client = ff.Client(metadata=metadata)
    if args.defs:
        import runpy

        ff.global_registrar().reset()
        runpy.run_path(args.defs)
        client.apply(wait=False)

    store_server, store_service = build_store(
        f"0.0.0.0:{args.store_port}", args.data_dir
    )
    store_server.start()
    LOGGER.info("embeddinghub grpc up", port=args.store_port)

    serving_server = build_serving(f"0.0.0.0:{args.serving_port}", client)
    serving_server.start()
    LOGGER.info("feature serving grpc up", port=args.serving_port)

    from embeddinghub_tpu.featurestore.metadata_grpc import (
        build_server as build_metadata,
    )

    metadata_server = build_metadata(
        f"0.0.0.0:{args.metadata_port}", metadata, client.coordinator
    )
    metadata_server.start()
    LOGGER.info("metadata grpc up", port=args.metadata_port)

    dashboard = DashboardServer(
        metadata, client.coordinator, port=args.http_port
    )
    dashboard.start()
    LOGGER.info("dashboard http up", port=dashboard.port)

    client.coordinator.start()
    LOGGER.info("coordinator poll loop up")
    print(
        f"embeddinghub-tpu up: store=:{args.store_port} "
        f"serving=:{args.serving_port} metadata=:{args.metadata_port} "
        f"http=:{dashboard.port}",
        flush=True,
    )
    try:
        store_server.wait_for_termination()
    except KeyboardInterrupt:
        pass
    finally:
        client.coordinator.stop()
        dashboard.stop()
        serving_server.stop(0)
        metadata_server.stop(0)
        store_service.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
