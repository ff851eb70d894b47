"""Schema registry: DEFINE-time event-type schemas, versioned, JSON-persisted.

The reference keeps a registry of `event_type -> (uid, version, MiniSchema)`
(reference: src/engine/schema/registry.rs:13-30, 182-196). Here the registry
is a plain JSON file under the engine data root — schemas are tiny metadata,
not data, so driver-side storage is the right call even at 100 TB.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from pyspark.sql import types as T

from sneldb_spark.errors import SchemaError
from sneldb_spark.schema.types import FieldType, parse_field_spec

_EVENT_TYPE_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")

# Core columns the engine adds to every event at ingest.
CORE_FIELDS = ("context_id", "event_type", "timestamp", "event_id")

CORE_STRUCT = [
    T.StructField("context_id", T.StringType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("timestamp", T.LongType(), False),  # epoch seconds, server-assigned
    T.StructField("event_id", T.LongType(), False),  # monotonic, shard-aware
]


class EventSchema:
    def __init__(self, name: str, version: int, fields: dict[str, FieldType]):
        self.name = name
        self.version = version
        self.fields = fields
        self.uid = f"{name}_v{version}"

    @property
    def spark_struct(self) -> T.StructType:
        """Full table schema: core columns + typed payload columns."""
        payload = [
            T.StructField(fname, ft.spark_type, True)
            for fname, ft in sorted(self.fields.items())
        ]
        return T.StructType(CORE_STRUCT + payload)

    def to_json(self):
        return {
            "name": self.name,
            "version": self.version,
            "fields": {k: v.to_json() for k, v in self.fields.items()},
        }

    @staticmethod
    def from_json(obj) -> "EventSchema":
        return EventSchema(
            obj["name"],
            obj["version"],
            {k: FieldType.from_json(v) for k, v in obj["fields"].items()},
        )


class SchemaRegistry:
    """In-memory registry with optional JSON-file persistence."""

    def __init__(self, path: str | None = None):
        self._path = path
        # name -> {version -> EventSchema}
        self._schemas: dict[str, dict[int, EventSchema]] = {}
        if path and os.path.exists(path):
            self._load()

    # -- define -----------------------------------------------------------
    def define(self, event_type: str, fields: dict, version: int | None = None) -> EventSchema:
        if not _EVENT_TYPE_RE.match(event_type or ""):
            raise SchemaError(f"invalid event type name: {event_type!r}")
        if not fields:
            raise SchemaError("schema must have at least one field")
        parsed: dict[str, FieldType] = {}
        for fname, spec in fields.items():
            if fname in CORE_FIELDS:
                raise SchemaError(f"field name {fname!r} is reserved")
            parsed[fname] = parse_field_spec(spec)
        existing = self._schemas.setdefault(event_type, {})
        if version is None:
            version = max(existing) + 1 if existing else 1
        # Additive evolution only: a field kept across versions must keep
        # its storage type. The reference stores each (type, version) under
        # its own uid with separate column files; here all versions share
        # one Parquet dataset, so a type flip would make old files
        # unreadable under the current read schema.
        if existing:
            latest = existing[max(existing)]
            for fname, ft in parsed.items():
                old = latest.fields.get(fname)
                if old is not None and old.kind != ft.kind:
                    raise SchemaError(
                        f"field {fname!r} changes type {old.kind!r} -> {ft.kind!r} "
                        f"across versions of {event_type!r}; add a new field instead"
                    )
        schema = EventSchema(event_type, version, parsed)
        existing[version] = schema
        self._save()
        return schema

    # -- lookup -----------------------------------------------------------
    def get(self, event_type: str, version: int | None = None) -> EventSchema:
        versions = self._schemas.get(event_type)
        if not versions:
            raise SchemaError(f"No schema defined for event type '{event_type}'")
        if version is None:
            version = max(versions)
        if version not in versions:
            raise SchemaError(f"no version {version} for event type {event_type!r}")
        return versions[version]

    def has(self, event_type: str) -> bool:
        return event_type in self._schemas

    def event_types(self) -> list[str]:
        return sorted(self._schemas)

    # -- persistence ------------------------------------------------------
    def _load(self):
        with open(self._path) as f:
            data = json.load(f)
        for item in data["schemas"]:
            s = EventSchema.from_json(item)
            self._schemas.setdefault(s.name, {})[s.version] = s

    def _save(self):
        if not self._path:
            return
        data = {
            "schemas": [
                s.to_json()
                for versions in self._schemas.values()
                for s in versions.values()
            ]
        }
        d = os.path.dirname(self._path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self._path)
