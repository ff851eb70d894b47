"""Parquet bloom filters on equality-probed columns (the reference's
per-field XOR-filter analogue, src/engine/core/filter/): written by every
segment writer when enabled, skipped for dictionary-encoded chunks, and
transparent to results."""

import glob
import os

import pytest
from pyspark.sql import functions as F


def _total_bytes(root: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(root, "events", "**", "*.parquet"), recursive=True)
    )


def _build(spark, root: str, bloom: bool, rows: int = 20_000):
    from sneldb_spark.store.event_store import EventStore

    store = EventStore(spark, root, wal=False, bloom_filters=bloom)
    store.registry.define("visit", {"page": "string", "v": "int"})
    df = spark.range(rows).select(
        F.concat(F.lit("ctx-"), F.md5(F.col("id").cast("string"))).alias("context_id"),
        F.lit("visit").alias("event_type"),
        (F.lit(1_700_000_000) + F.col("id") % 86_400).alias("timestamp"),
        F.col("id").alias("event_id"),
        F.concat(F.lit("/p/"), F.md5(F.col("id").cast("string"))).alias("page"),
        F.col("id").alias("v"),
    )
    store.append_dataframe("visit", df)
    return store


def test_bloom_filters_written_and_transparent(spark, tmp_path):
    with_bloom = _build(spark, str(tmp_path / "on"), bloom=True)
    without = _build(spark, str(tmp_path / "off"), bloom=False)

    # presence: same rows, same writer — the bloom store carries the extra
    # filter bytes (two high-cardinality string columns get blooms)
    on_b, off_b = _total_bytes(with_bloom.root), _total_bytes(without.root)
    assert on_b > off_b + 10_000, (on_b, off_b)

    # results are identical either way, present or missing key
    probe = with_bloom.read("visit").select("context_id").limit(1).collect()[0][0]
    for store in (with_bloom, without):
        df = store.read("visit")
        assert df.filter(F.col("context_id") == probe).count() == 1
        assert df.filter(F.col("context_id") == "ctx-missing").count() == 0
        assert df.count() == 20_000


def test_bloom_options_cover_string_fields_only(spark, tmp_path):
    from sneldb_spark.store.event_store import EventStore

    store = EventStore(spark, str(tmp_path / "db"), wal=False)
    store.registry.define(
        "order",
        {"sku": "string", "qty": "int", "plan": ["a", "b"], "price": "float"},
    )
    opts = store._bloom_options("order")
    enabled = {k.split("#")[1] for k in opts if "#" in k}
    # context_id always; string + enum payload fields; numerics excluded
    assert enabled == {"context_id", "sku", "plan"}
    assert opts["parquet.bloom.filter.adaptive.enabled"] == "true"
    # disabled store emits nothing
    off = EventStore(spark, str(tmp_path / "db2"), wal=False, bloom_filters=False)
    assert off._bloom_options("order") == {}


def test_config_key_disables_blooms(spark, tmp_path):
    from sneldb_spark.config import load_config

    cfg = load_config({"data_dir": str(tmp_path / "d"), "storage": {"bloom_filters": False}})
    assert cfg.bloom_filters is False
    assert load_config({"data_dir": str(tmp_path / "d")}).bloom_filters is True
