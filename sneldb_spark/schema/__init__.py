from sneldb_spark.schema.registry import EventSchema, SchemaRegistry
from sneldb_spark.schema.types import FieldType, parse_field_spec

__all__ = ["EventSchema", "SchemaRegistry", "FieldType", "parse_field_spec"]
