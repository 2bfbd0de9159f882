"""Demo data loader (reference ``data_loader/``: a small CSV -> store
loader used in demos).  Loads a CSV into the offline store and
optionally registers + materializes a feature per value column.

Usage:
    python -m embeddinghub_tpu.featurestore.data_loader data.csv \
        --entity-column user_id --source events
"""

from __future__ import annotations

import argparse
import csv
import sys


def load_csv(path: str) -> list[dict]:
    with open(path) as f:
        rows = list(csv.DictReader(f))
    # best-effort numeric conversion
    out = []
    for r in rows:
        conv = {}
        for k, v in r.items():
            try:
                conv[k] = int(v)
            except (TypeError, ValueError):
                try:
                    conv[k] = float(v)
                except (TypeError, ValueError):
                    conv[k] = v
        out.append(conv)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--entity-column", required=True)
    ap.add_argument("--source", default="demo")
    ap.add_argument("--entity", default="entity")
    ap.add_argument("--db", default=None)
    args = ap.parse_args(argv)

    rows = load_csv(args.csv)
    if not rows:
        print("no rows", file=sys.stderr)
        return 1

    import embeddinghub_tpu.featurestore as ff
    from embeddinghub_tpu.featurestore.metadata import MetadataStore, SqliteStorage

    metadata = MetadataStore(SqliteStorage(args.db)) if args.db else MetadataStore()
    client = ff.Client(metadata=metadata)
    reg = client.registrar
    reg.register_sqlite_offline("loader-warehouse")
    reg.register_memory_online("loader-cache")
    reg.register_entity(args.entity)
    reg.register_primary_data(
        args.source, provider="loader-warehouse", location={"rows": rows}
    )
    value_cols = [
        c
        for c in rows[0]
        if c != args.entity_column
        and isinstance(rows[0][c], (int, float))
    ]
    for col in value_cols:
        reg.register_feature(
            col,
            source=(args.source, "default"),
            entity=args.entity,
            entity_column=args.entity_column,
            value_column=col,
            provider="loader-cache",
        )
    client.apply()
    print(f"loaded {len(rows)} rows; features: {value_cols}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
