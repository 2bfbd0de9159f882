"""CLI — apply / get / list (reference ``client/src/featureform/cli.py``).

Usage:
    python -m embeddinghub_tpu.featurestore.cli apply <definitions.py>
    python -m embeddinghub_tpu.featurestore.cli list <type> [--db state.db]
    python -m embeddinghub_tpu.featurestore.cli get <type> <name> [variant]
    python -m embeddinghub_tpu.featurestore.cli search <query>

``apply`` executes the definitions file (which uses
``embeddinghub_tpu.featurestore.global_registrar()``), submits the
resources, runs orchestration, and persists metadata when ``--db`` is
given.
"""

from __future__ import annotations

import argparse
import runpy
import sys

import embeddinghub_tpu.featurestore as ff
from embeddinghub_tpu.featurestore.metadata import MetadataStore, SqliteStorage
from embeddinghub_tpu.featurestore.resources import ResourceType
from embeddinghub_tpu.featurestore.search import SearchIndex

_TYPES = {
    "feature": ResourceType.FEATURE_VARIANT,
    "source": ResourceType.SOURCE_VARIANT,
    "label": ResourceType.LABEL_VARIANT,
    "training-set": ResourceType.TRAINING_SET_VARIANT,
    "entity": ResourceType.ENTITY,
    "user": ResourceType.USER,
    "provider": ResourceType.PROVIDER,
    "model": ResourceType.MODEL,
}


def _client(db: str | None) -> ff.Client:
    metadata = MetadataStore(SqliteStorage(db)) if db else MetadataStore()
    return ff.Client(metadata=metadata)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ehtpu")
    parser.add_argument("--db", default=None, help="sqlite metadata path")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_apply = sub.add_parser("apply")
    p_apply.add_argument("definitions")

    p_list = sub.add_parser("list")
    p_list.add_argument("type", choices=sorted(_TYPES))

    p_get = sub.add_parser("get")
    p_get.add_argument("type", choices=sorted(_TYPES))
    p_get.add_argument("name")
    p_get.add_argument("variant", nargs="?", default="")

    p_search = sub.add_parser("search")
    p_search.add_argument("query")

    args = parser.parse_args(argv)
    client = _client(args.db)

    if args.cmd == "apply":
        ff.global_registrar().reset()
        runpy.run_path(args.definitions)
        created = client.apply()
        for res in created:
            print(f"created {res.rid().key()}")
        for res in client.metadata.all():
            print(f"{res.rid().key()}: {res.status.value}")
        return 0

    if args.cmd == "list":
        for res in client.list_resources(_TYPES[args.type]):
            variant = getattr(res, "variant", "")
            print(
                f"{res.name}"
                + (f".{variant}" if variant else "")
                + f"\t{res.status.value}"
            )
        return 0

    if args.cmd == "get":
        from embeddinghub_tpu.featurestore.resources import ResourceID

        if args.variant:
            res = client.metadata.get(
                ResourceID(_TYPES[args.type], args.name, args.variant)
            )
            variants = [res]
        else:
            variants = client.metadata.variants(_TYPES[args.type], args.name)
            if not variants:
                res = client.metadata.get(
                    ResourceID(_TYPES[args.type], args.name)
                )
                variants = [res]
        for res in variants:
            print(f"name: {res.name}")
            if getattr(res, "variant", ""):
                print(f"variant: {res.variant}")
            print(f"status: {res.status.value}")
            if res.status_error:
                print(f"error: {res.status_error}")
            if res.description:
                print(f"description: {res.description}")
        return 0

    if args.cmd == "search":
        idx = SearchIndex(client.metadata)
        for doc in idx.search(args.query):
            print(f"{doc['type']}\t{doc['name']}\t{doc['variant']}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
