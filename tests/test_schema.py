import pytest

from sneldb_spark.errors import SchemaError, ValidationError
from sneldb_spark.schema.normalization import (
    normalize_date_to_midnight,
    parse_time_value,
    try_parse_time_value,
)
from sneldb_spark.schema.registry import SchemaRegistry
from sneldb_spark.schema.types import FieldType, parse_field_spec
from sneldb_spark.schema.validation import validate_payload


def test_type_aliases():
    assert parse_field_spec("varchar").kind == "string"
    assert parse_field_spec("integer").kind == "i64"
    assert parse_field_spec("number").kind == "f64"
    assert parse_field_spec("uint64").kind == "u64"
    assert parse_field_spec("timestamp").kind == "datetime"


def test_nullable():
    ft = parse_field_spec("string | null")
    assert ft.nullable and ft.kind == "string"


def test_enum_limits():
    ft = parse_field_spec(["pro", "basic"])
    assert ft.kind == "enum" and ft.enum_values == ("pro", "basic")
    with pytest.raises(SchemaError):
        parse_field_spec([])
    with pytest.raises(SchemaError):
        parse_field_spec(["a"] * 257)
    with pytest.raises(SchemaError):
        parse_field_spec(["a", "a"])
    with pytest.raises(SchemaError):
        parse_field_spec(["a", ""])


def test_time_parsing():
    assert parse_time_value("2024-01-01") == 1704067200
    assert parse_time_value("2024-01-01T00:00:10Z") == 1704067210
    assert parse_time_value("2024-01-01 00:00:10+00:00") == 1704067210
    # magnitude sniffing: s / ms / us / ns
    assert parse_time_value(1704067200) == 1704067200
    assert parse_time_value(1704067200_000) == 1704067200
    assert parse_time_value(1704067200_000_000) == 1704067200
    assert parse_time_value(1704067200_000_000_000) == 1704067200
    assert parse_time_value("1704067200000") == 1704067200
    assert try_parse_time_value("not a time") is None


def test_date_midnight():
    assert normalize_date_to_midnight(1704067200 + 3600 * 5) == 1704067200


def _registry(tmp_path):
    return SchemaRegistry(str(tmp_path / "schemas.json"))


def test_registry_versions(tmp_path):
    reg = _registry(tmp_path)
    s1 = reg.define("orders", {"amount": "int"})
    assert s1.version == 1
    s2 = reg.define("orders", {"amount": "int", "country": "string"})
    assert s2.version == 2
    assert reg.get("orders").version == 2
    assert reg.get("orders", 1).fields.keys() == {"amount"}
    # persistence round trip
    reg2 = _registry(tmp_path)
    assert reg2.get("orders").version == 2


def test_registry_errors(tmp_path):
    reg = _registry(tmp_path)
    with pytest.raises(SchemaError):
        reg.get("nope")
    with pytest.raises(SchemaError):
        reg.define("bad name!", {"a": "int"})
    with pytest.raises(SchemaError):
        reg.define("t", {"timestamp": "int"})  # reserved core field


def _schema(tmp_path, fields):
    reg = _registry(tmp_path)
    return reg.define("t", fields)


def test_validation_strict(tmp_path):
    schema = _schema(tmp_path, {"amount": "int", "plan": ["pro", "basic"], "note": "string | null"})
    ok = validate_payload(schema, {"amount": 5, "plan": "pro"})
    assert ok == {"amount": 5, "plan": "pro", "note": None}
    with pytest.raises(ValidationError):  # missing required
        validate_payload(schema, {"plan": "pro"})
    with pytest.raises(ValidationError):  # extra key
        validate_payload(schema, {"amount": 5, "plan": "pro", "x": 1})
    with pytest.raises(ValidationError):  # enum case-sensitive
        validate_payload(schema, {"amount": 5, "plan": "PRO"})
    with pytest.raises(ValidationError):  # bool is not int
        validate_payload(schema, {"amount": True, "plan": "pro"})


def test_validation_times(tmp_path):
    schema = _schema(tmp_path, {"at": "datetime", "day": "date"})
    out = validate_payload(schema, {"at": "2024-01-01T05:00:00Z", "day": "2024-01-01T05:00:00Z"})
    assert out["at"] == 1704085200
    assert out["day"] == 1704067200  # snapped to midnight UTC


def test_validation_u64(tmp_path):
    schema = _schema(tmp_path, {"n": "u64"})
    assert validate_payload(schema, {"n": 0}) == {"n": 0}
    with pytest.raises(ValidationError):
        validate_payload(schema, {"n": -1})


def test_fieldtype_json_roundtrip():
    for ft in [
        FieldType("i64", True),
        FieldType("enum", False, ("a", "b")),
        FieldType("datetime", False),
    ]:
        assert FieldType.from_json(ft.to_json()) == ft


def test_version_bump_adds_column_null_filled(engine):
    # Files written before the bump lack the new column; reads must
    # null-fill it, not silently drop it (explicit read schema).
    engine.execute('DEFINE sv2 FIELDS { "a": "int" }')
    engine.execute('STORE sv2 FOR c1 PAYLOAD { "a": 1 }')
    engine.execute("FLUSH")
    engine.execute('DEFINE sv2 AS 2 FIELDS { "a": "int", "b": "string | null" }')
    engine.execute('STORE sv2 FOR c2 PAYLOAD { "a": 2, "b": "x" }')
    engine.execute("FLUSH")
    rows = {r["a"]: r for r in engine.query("QUERY sv2").collect()}
    assert "b" in rows[1].asDict() and rows[1]["b"] is None and rows[2]["b"] == "x"
    assert engine.query('QUERY sv2 WHERE b = "x"').count() == 1


def test_version_bump_type_change_rejected(engine):
    import pytest

    from sneldb_spark.errors import SchemaError

    engine.execute('DEFINE tv FIELDS { "a": "int" }')
    with pytest.raises(SchemaError, match="changes type"):
        engine.execute('DEFINE tv AS 2 FIELDS { "a": "string" }')


# -- schema store diagnose / repair (reference: schema_store_tool.rs) ----


def _make_store(tmp_path):
    path = str(tmp_path / "schemas.json")
    reg = SchemaRegistry(path)
    reg.define("orders", {"amount": "int", "country": "string"})
    reg.define("orders", {"amount": "int", "country": "string", "note": "string"})
    reg.define("clicks", {"url": "string"})
    return path


def test_diagnose_clean_store(tmp_path):
    from sneldb_spark.schema.registry import diagnose_store

    path = _make_store(tmp_path)
    report = diagnose_store(path)
    assert report["version"] == 1
    assert report["valid_records"] == 3
    assert report["skipped_records"] == 0
    assert report["issues"] == []


def test_diagnose_flags_bad_records(tmp_path):
    import json as _json

    from sneldb_spark.schema.registry import diagnose_store

    path = _make_store(tmp_path)
    doc = _json.load(open(path))
    doc["schemas"].append({"name": "bad name!", "version": 1, "fields": {"x": {"kind": "int"}}})
    doc["schemas"].append({"name": "dup", "version": 0, "fields": {"x": {"kind": "int"}}})
    doc["schemas"].append(doc["schemas"][0])  # duplicate (name, version)
    doc["schemas"].append({"name": "orders", "version": 9, "fields": {"amount": {"kind": "string"}}})  # type flip
    _json.dump(doc, open(path, "w"))
    report = diagnose_store(path)
    assert report["valid_records"] == 3
    assert report["skipped_records"] == 4
    assert len(report["issues"]) == 4


def test_diagnose_flags_unknown_field_kind(tmp_path):
    """A record whose field kind is not a known type must be SKIPPED, not
    certified — a repaired store containing it would crash the engine at
    first spark_struct access (KeyError), defeating the tool's purpose."""
    import json as _json

    from sneldb_spark.schema.registry import diagnose_store

    path = _make_store(tmp_path)
    doc = _json.load(open(path))
    doc["schemas"].append(
        {"name": "weird", "version": 1,
         "fields": {"x": {"kind": "integr", "nullable": False}}}
    )
    doc["schemas"].append(  # bare "enum" without variants is not a type
        {"name": "weird2", "version": 1,
         "fields": {"x": {"kind": "enum", "nullable": False}}}
    )
    doc["schemas"].append(  # non-bool nullable
        {"name": "weird3", "version": 1,
         "fields": {"x": {"kind": "i64", "nullable": "yes"}}}
    )
    _json.dump(doc, open(path, "w"))
    report = diagnose_store(path)
    assert report["valid_records"] == 3
    assert report["skipped_records"] == 3
    assert any("integr" in i for i in report["issues"])


def test_registry_load_fails_fast_on_unknown_kind(tmp_path):
    """Loading a store with an invalid kind raises SchemaError at
    construction, not KeyError at first query."""
    import json as _json

    import pytest

    from sneldb_spark.errors import SchemaError

    path = _make_store(tmp_path)
    doc = _json.load(open(path))
    doc["schemas"][0]["fields"]["amount"]["kind"] = "integr"
    _json.dump(doc, open(path, "w"))
    with pytest.raises(SchemaError, match="integr"):
        SchemaRegistry(path)


def test_diagnose_salvages_truncated_store(tmp_path):
    from sneldb_spark.schema.registry import diagnose_store

    path = _make_store(tmp_path)
    text = open(path).read()
    # chop the file mid-way through the last record (crash mid-copy)
    open(path, "w").write(text[: int(len(text) * 0.6)])
    report = diagnose_store(path)
    assert report["valid_records"] >= 1  # earlier records recovered
    assert any("not valid JSON" in i for i in report["issues"])


def test_repair_store_roundtrip(tmp_path):
    import json as _json

    from sneldb_spark.schema.registry import diagnose_store, repair_store

    path = _make_store(tmp_path)
    doc = _json.load(open(path))
    doc["schemas"].append({"name": "??", "version": 1, "fields": {}})
    _json.dump(doc, open(path, "w"))
    out = str(tmp_path / "repaired.json")
    report = repair_store(path, out)
    assert report["repaired_to"] == out
    assert report["valid_records"] == 3 and report["skipped_records"] == 1
    # the repaired store is clean AND loads as a registry
    clean = diagnose_store(out)
    assert clean["skipped_records"] == 0 and clean["version"] == 1
    reg = SchemaRegistry(out)
    assert reg.event_types() == ["clicks", "orders"]
    assert reg.get("orders").version == 2


def test_schema_store_tool_cli(tmp_path, capsys):
    import json as _json
    import sys as _sys

    _sys.path.insert(0, "tools")
    from schema_store_tool import main as tool_main

    path = _make_store(tmp_path)
    rc = tool_main(["schema_store_tool", "verify", path])
    out = capsys.readouterr().out
    assert rc == 0
    report = _json.loads(out)
    assert report["valid_records"] == 3 and report["repaired_to"] is None
    rc = tool_main(["schema_store_tool", "repair", path, str(tmp_path / "out.json")])
    assert rc == 0
    assert _json.loads(capsys.readouterr().out)["repaired_to"].endswith("out.json")
    rc = tool_main(["schema_store_tool", "verify", str(tmp_path / "missing.json")])
    assert rc == 1
