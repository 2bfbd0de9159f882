"""CLI session walkthrough — apply / list / get / search, end to end.

Mirrors the reference's ``featureform apply|get|list`` workflow
(``client/src/featureform/cli.py``): it writes a definitions file,
applies it with the live status display, then shows the fixed-width
list/get output (reference format.py column layout).

Run:  python examples/cli_session.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embeddinghub_tpu.featurestore import cli
from embeddinghub_tpu.featurestore.providers.base import reset_provider_cache

DEFS = """
import embeddinghub_tpu.featurestore as ff

reg = ff.global_registrar()
reg.register_user("alice")
reg.register_sqlite_offline("warehouse")
reg.register_memory_online("cache")
reg.register_entity("user")
reg.register_primary_data(
    "events", provider="warehouse",
    location={"rows": [
        {"user_id": "u1", "clicks": 10, "ts": 1},
        {"user_id": "u2", "clicks": 20, "ts": 1},
    ]},
)

@reg.sql_transformation("heavy_clickers", provider="warehouse",
                        inputs=[("events", "default")])
def heavy_clickers():
    "SELECT user_id, clicks FROM {{ events.default }} WHERE clicks > 15"

reg.register_feature(
    "clicks", source=("events", "default"), entity="user",
    entity_column="user_id", value_column="clicks", provider="cache",
    owner="alice",
)
reg.register_label(
    "clicked", source=("events", "default"), entity="user",
    entity_column="user_id", value_column="clicks",
)
reg.register_training_set(
    "model", label=("clicked", "default"),
    features=[("clicks", "default")],
)
"""


def run(args: list[str]) -> None:
    print(f"\n$ ehtpu {' '.join(args)}")
    rc = cli.main(args)
    assert rc == 0, f"exit {rc}"


def main() -> None:
    reset_provider_cache()
    with tempfile.TemporaryDirectory() as tmp:
        defs = os.path.join(tmp, "definitions.py")
        with open(defs, "w") as f:
            f.write(DEFS)
        db = os.path.join(tmp, "state.db")

        run(["--db", db, "apply", defs])
        run(["--db", db, "list", "feature"])
        run(["--db", db, "list", "source"])
        run(["--db", db, "get", "feature", "clicks", "default"])
        run(["--db", db, "get", "training-set", "model"])
        run(["--db", db, "search", "clicks"])


if __name__ == "__main__":
    main()
