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


def _deploy(args) -> int:
    """Local-stack bootstrap: spawn/stop/poll the composed process
    (``embeddinghub_tpu.main`` — store + serving + metadata + dashboard
    + coordinator).  The reference's ``featureform deploy`` spins the
    same single-binary stack inside docker (deploy.py DockerDeployment);
    here the image has no docker, so the stack runs as a child process
    tracked by a pid file."""
    import json
    import os
    import signal
    import subprocess
    import time
    import urllib.request

    def alive() -> int | None:
        try:
            pid = int(open(args.pid_file).read().strip())
            os.kill(pid, 0)
            return pid
        except (OSError, ValueError):
            return None

    health_url = f"http://127.0.0.1:{args.http_port}/health"

    if args.action == "status":
        pid = alive()
        if pid is None:
            print("status: DOWN")
            return 1
        try:
            body = urllib.request.urlopen(health_url, timeout=5).read()
            print(f"status: UP (pid {pid})")
            print(json.dumps(json.loads(body), indent=2))
            return 0
        except Exception as ex:
            print(f"status: STARTING (pid {pid}; health: {ex})")
            return 1

    if args.action == "stop":
        pid = alive()
        if pid is None:
            print("not running")
            return 0
        os.kill(pid, signal.SIGTERM)
        for _ in range(50):
            if alive() is None:
                break
            time.sleep(0.2)
        try:
            os.unlink(args.pid_file)
        except OSError:
            pass
        print(f"stopped pid {pid}")
        return 0

    if alive() is not None:
        print(f"already running (pid {alive()}); `deploy stop` first")
        return 1
    cmd = [
        sys.executable, "-m", "embeddinghub_tpu.main",
        "--store-port", str(args.store_port),
        "--serving-port", str(args.serving_port),
        "--metadata-port", str(args.metadata_port),
        "--http-port", str(args.http_port),
        "--data-dir", args.data_dir,
    ]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    with open(args.pid_file, "w") as f:
        f.write(str(proc.pid))
    deadline = time.time() + args.wait
    while time.time() < deadline:
        if proc.poll() is not None:
            print(f"stack exited early (code {proc.returncode})")
            return 1
        try:
            urllib.request.urlopen(health_url, timeout=2)
            print(
                f"deployed (pid {proc.pid}): store=:{args.store_port} "
                f"serving=:{args.serving_port} "
                f"metadata=:{args.metadata_port} http=:{args.http_port}"
            )
            return 0
        except Exception:
            time.sleep(0.5)
    print(f"started pid {proc.pid}, health not up after {args.wait}s")
    return 1


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

    sub.add_parser("version", help="client + engine versions "
                                   "(reference cli.py version)")

    p_head = sub.add_parser(
        "head", help="first rows of a registered source "
                     "(reference cli.py:175 head)")
    p_head.add_argument("name")
    p_head.add_argument("variant", nargs="?", default="default")
    p_head.add_argument("--limit", type=int, default=10)

    p_deploy = sub.add_parser(
        "deploy",
        help="start/stop/query a local single-process stack (the "
             "reference's `featureform deploy` quickstart, deploy.py, "
             "rebuilt for the in-image composed binary main.py)",
    )
    p_deploy.add_argument("action", choices=["start", "stop", "status"],
                          nargs="?", default="start")
    p_deploy.add_argument("--data-dir", default="./embedding_store.dat")
    p_deploy.add_argument("--store-port", type=int, default=7462)
    p_deploy.add_argument("--serving-port", type=int, default=8081)
    p_deploy.add_argument("--metadata-port", type=int, default=8080)
    p_deploy.add_argument("--http-port", type=int, default=3001)
    p_deploy.add_argument("--pid-file", default="/tmp/ehtpu_deploy.pid")
    p_deploy.add_argument("--wait", type=float, default=30.0,
                          help="seconds to wait for the stack health")

    args = parser.parse_args(argv)
    if args.cmd == "deploy":
        return _deploy(args)
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

    if args.cmd == "version":
        import embeddinghub_tpu

        print(f"embeddinghub_tpu {embeddinghub_tpu.__version__}")
        try:
            import jax

            print(f"jax {jax.__version__} ({jax.default_backend()})")
        except Exception:  # noqa: BLE001 - version print must not fail
            pass
        return 0

    if args.cmd == "head":
        rows = client.rows(args.name, args.variant)[: args.limit]
        if not rows:
            print("(empty)")
            return 0
        cols = list(rows[0].keys())
        format_rows(*cols) if len(cols) > 1 else format_rows(cols[0], "")
        for r in rows:
            vals = [str(r.get(c, "")) for c in cols]
            format_rows(*vals) if len(vals) > 1 else format_rows(vals[0], "")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
