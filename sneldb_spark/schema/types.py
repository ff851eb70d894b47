"""SnelDB schema-language field types mapped onto Spark types.

Semantics follow the reference's schema language
(reference: src/engine/schema/types.rs:32-84):

- scalar kinds with aliases (``string``/``str``/``text``/``varchar``, ...);
- ``T | null`` marks a nullable field;
- a JSON list of strings is a closed enum (<=256 unique, non-empty,
  case-sensitive variants);
- ``datetime`` values normalize to epoch **seconds**; ``date`` values to
  midnight-UTC epoch seconds. Both are stored as LongType so comparison
  semantics are plain integer comparisons, exactly like the reference.

Spark has no unsigned 64-bit integer; ``u64`` maps to LongType and the
non-negative domain is enforced at ingest validation time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from sneldb_spark.errors import SchemaError

# kind -> canonical name
_ALIASES = {
    "string": "string",
    "str": "string",
    "text": "string",
    "varchar": "string",
    "u64": "u64",
    "uint64": "u64",
    "i64": "i64",
    "int64": "i64",
    "int": "i64",
    "integer": "i64",
    "f64": "f64",
    "float": "f64",
    "double": "f64",
    "number": "f64",
    "bool": "bool",
    "boolean": "bool",
    "datetime": "datetime",
    "timestamp": "datetime",
    "date": "date",
}

MAX_ENUM_VARIANTS = 256

_SPARK_TYPES = {
    "string": T.StringType(),
    "u64": T.LongType(),
    "i64": T.LongType(),
    "f64": T.DoubleType(),
    "bool": T.BooleanType(),
    "datetime": T.LongType(),  # epoch seconds
    "date": T.LongType(),  # midnight-UTC epoch seconds
    "enum": T.StringType(),
}


@dataclass(frozen=True)
class FieldType:
    kind: str  # one of _SPARK_TYPES keys
    nullable: bool = False
    enum_values: tuple[str, ...] = field(default=())

    @property
    def spark_type(self) -> T.DataType:
        return _SPARK_TYPES[self.kind]

    @property
    def is_time(self) -> bool:
        return self.kind in ("datetime", "date")

    def to_json(self):
        if self.kind == "enum":
            spec: object = list(self.enum_values)
        else:
            spec = self.kind
        return {"kind": spec, "nullable": self.nullable}

    @staticmethod
    def from_json(obj) -> "FieldType":
        """Deserialize a persisted field spec, validating it.

        A store written by `to_json` is always canonical, but this is the
        load boundary for hand-edited, migrated, or corrupted stores too
        (diagnose_store / repair_store certify records through here), so an
        unknown kind must fail HERE with a SchemaError — not later as a
        KeyError when `spark_type` is first touched mid-query."""
        kind = obj["kind"]
        nullable = obj["nullable"]
        if not isinstance(nullable, bool):
            raise SchemaError(f"nullable must be a boolean: {nullable!r}")
        if isinstance(kind, list):
            ft = parse_field_spec(kind)
            return FieldType("enum", nullable, ft.enum_values)
        if not isinstance(kind, str):
            raise SchemaError(f"unsupported field kind: {kind!r}")
        canon = _ALIASES.get(kind.lower())
        if canon is None:  # bare "enum" without variants is invalid too
            raise SchemaError(f"unknown field type: {kind!r}")
        return FieldType(canon, nullable)


def parse_field_spec(spec) -> FieldType:
    """Parse one DEFINE field spec: a type-name string, ``"T | null"``, a
    JSON list of enum variants, or an already-built FieldType (used by
    snapshot import, where the string form cannot express a nullable
    enum)."""
    if isinstance(spec, FieldType):
        return spec
    if isinstance(spec, list):
        if not spec:
            raise SchemaError("enum must have at least one variant")
        if len(spec) > MAX_ENUM_VARIANTS:
            raise SchemaError(
                f"enum has {len(spec)} variants; max is {MAX_ENUM_VARIANTS}"
            )
        variants: list[str] = []
        for v in spec:
            if not isinstance(v, str) or v == "":
                raise SchemaError(f"enum variants must be non-empty strings: {v!r}")
            variants.append(v)
        if len(set(variants)) != len(variants):
            raise SchemaError("enum variants must be unique")
        return FieldType("enum", nullable=False, enum_values=tuple(variants))

    if not isinstance(spec, str):
        raise SchemaError(f"unsupported field spec: {spec!r}")

    parts = [p.strip() for p in spec.split("|")]
    nullable = False
    type_parts = []
    for p in parts:
        if p.lower() == "null":
            nullable = True
        else:
            type_parts.append(p)
    if len(type_parts) != 1:
        raise SchemaError(f"invalid field type: {spec!r}")
    name = type_parts[0].lower()
    if name not in _ALIASES:
        raise SchemaError(f"unknown field type: {type_parts[0]!r}")
    return FieldType(_ALIASES[name], nullable=nullable)
