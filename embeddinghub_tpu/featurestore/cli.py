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
from embeddinghub_tpu.featurestore.format import format_pg, format_rows
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
    p_apply.add_argument("--verbose", action="store_true",
                         help="raise if any resource FAILED")

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
        created = client.apply(display=True, verbose=args.verbose)
        for res in created:
            print(f"created {res.rid().key()}")
        return 0

    if args.cmd == "list":
        # reference list.py column layout (NAME / VARIANT / STATUS)
        format_rows("NAME", "VARIANT", "STATUS")
        for res in client.list_resources(_TYPES[args.type]):
            format_rows(
                res.name, getattr(res, "variant", ""), res.status.value
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
            # reference get.py field layout (get.py:40-58)
            rows = [("NAME: ", res.name)]
            if getattr(res, "variant", ""):
                rows.append(("VARIANT: ", res.variant))
            for label, attr in (
                ("ENTITY:", "entity"),
                ("OWNER:", "owner"),
                ("DESCRIPTION:", "description"),
                ("PROVIDER:", "provider"),
            ):
                val = getattr(res, attr, "")
                if val:
                    rows.append((label, val))
            rows.append(("STATUS: ", res.status.value))
            if res.status.value == "FAILED" and res.status_error:
                rows.append(("ERROR: ", res.status_error))
            format_rows(rows)
            src = getattr(res, "source", None)
            if src and src[0]:
                format_pg("SOURCE: ")
                format_rows([("NAME", "VARIANT"), (src[0], src[1])])
            deps = res.dependencies()
            if deps:
                format_pg("DEPENDS ON:")
                format_rows("NAME", "VARIANT", "TYPE")
                for d in deps:
                    format_rows(d.name, d.variant, d.type.value)
            format_pg()
        return 0

    if args.cmd == "search":
        idx = SearchIndex(client.metadata)
        for doc in idx.search(args.query):
            print(f"{doc['type']}\t{doc['name']}\t{doc['variant']}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
