"""Event snapshots: portable export/import of stored events + schemas.

The reference exports `.snp`/`.smt` files (reference: src/engine/core/snapshot/,
docs/src/design/storage_engine.md). Here a snapshot is a directory of
per-type Parquet plus the schema registry JSON — portable across engines
and readable by anything that speaks Parquet.
"""

from __future__ import annotations

import json
import os

from sneldb_spark.schema.types import FieldType
from sneldb_spark.store.event_store import EventStore


def export_snapshot(store: EventStore, path: str, event_types: list[str] | None = None):
    types = event_types or store.registry.event_types()
    os.makedirs(path, exist_ok=True)
    exported = []
    for et in types:
        if not store.has_data(et):
            continue
        store.read(et).write.mode("overwrite").parquet(os.path.join(path, f"{et}.parquet"))
        exported.append(et)
    schemas = {
        et: store.registry.get(et).to_json() for et in types if store.registry.has(et)
    }
    with open(os.path.join(path, "snapshot.json"), "w") as f:
        json.dump({"event_types": exported, "schemas": schemas}, f, indent=1)


def import_snapshot(store: EventStore, path: str):
    with open(os.path.join(path, "snapshot.json")) as f:
        meta = json.load(f)
    for et, schema_json in meta["schemas"].items():
        if not store.registry.has(et):
            # Rebuild FieldTypes directly instead of round-tripping through
            # the string spec form, which cannot express a nullable enum —
            # the old path silently re-imported those as non-nullable and
            # then rejected stores of null values.
            fields = {
                fname: FieldType.from_json(spec)
                for fname, spec in schema_json["fields"].items()
            }
            store.registry.define(et, fields, version=schema_json["version"])
    for et in meta["event_types"]:
        df = store.spark.read.parquet(os.path.join(path, f"{et}.parquet"))
        store.append_dataframe(et, df)
