"""Engine error types (mirrors the reference's user-facing error categories)."""

from __future__ import annotations


class SnelDBError(Exception):
    """Base class for all engine errors."""


class ParseError(SnelDBError):
    """Command text failed to parse."""


class SchemaError(SnelDBError):
    """DEFINE-time schema problem (bad type, too many enum variants, ...)."""


class ValidationError(SnelDBError):
    """STORE-time payload rejection (missing/extra field, type/enum mismatch)."""


class QueryError(SnelDBError):
    """Semantically invalid query (e.g. OFFSET without LIMIT, unknown type)."""


class MaterializationError(SnelDBError):
    """REMEMBER/SHOW problems (duplicate or unknown materialization name)."""
