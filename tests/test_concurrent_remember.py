"""Snapshot-pinned overlap (r11): a bulk loader may resume appends the
moment a REMEMBER bootstrap pins its read mark (`Materializer.on_snapshot`),
and the engine's delta discipline makes the final SHOW identical to the
fully-sequential phases. These tests drive the overlapped shape the
lifecycle gates use and pin its exactness + hook ordering."""

import threading

from pyspark.sql import functions as F


def _mk_events(spark, et, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("c"), (F.col("id") % 13)).alias("context_id"),
        F.lit(et).alias("event_type"),
        (1_700_000_000 + F.col("id")).alias("timestamp"),
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("int").alias("v"),
    )


def _overlapped_remember(db, text, ingest_fn):
    """The gates' shape: REMEMBER in a thread, ingest after the mark pins."""
    pinned = threading.Event()
    db.materializer.on_snapshot = pinned.set
    try:
        err = []

        def run():
            try:
                db.execute(text)
            except BaseException as e:  # noqa: BLE001
                err.append(e)
            finally:
                pinned.set()

        t = threading.Thread(target=run, daemon=True)
        t.start()
        assert pinned.wait(timeout=120), "on_snapshot hook never fired"
        try:
            ingest_fn()
        finally:
            t.join()
        if err:
            raise err[0]
    finally:
        db.materializer.on_snapshot = None


def test_overlapped_agg_remember_equals_sequential(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"))
    db.store.registry.define("p", {"v": "int"})
    db.store.append_dataframe("p", _mk_events(spark, "p", 0, 300))
    _overlapped_remember(
        db,
        "REMEMBER QUERY p COUNT, TOTAL v, COUNT UNIQUE context_id BY v AS st",
        lambda: db.store.append_dataframe("p", _mk_events(spark, "p", 300, 500)),
    )
    got = {
        r["v"]: (r["count"], r["total_v"], r["count_unique_context_id"])
        for r in db.execute("SHOW st").df.collect()
    }
    want = {
        r["v"]: (r["count"], r["total_v"], r["cu"])
        for r in _mk_events(spark, "p", 0, 500)
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum("v").alias("total_v"),
            F.countDistinct("context_id").alias("cu"),
        )
        .collect()
    }
    assert got == want
    db.close()


def test_overlapped_seq_remember_equals_batch(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"))
    for et in ("a", "b"):
        db.store.registry.define(et, {"v": "int"})
    # interleaved timelines; first half ingested before REMEMBER
    db.store.append_dataframe("a", _mk_events(spark, "a", 0, 200))
    db.store.append_dataframe("b", _mk_events(spark, "b", 100, 300))

    def second_half():
        db.store.append_dataframe("a", _mk_events(spark, "a", 300, 450))
        db.store.append_dataframe("b", _mk_events(spark, "b", 350, 600))

    _overlapped_remember(
        db,
        "REMEMBER QUERY a FOLLOWED BY b LINKED BY context_id AS fm",
        second_half,
    )
    shown = {
        (r["a_event_id"], r["b_event_id"])
        for r in db.execute("SHOW fm").df.collect()
    }
    direct = {
        (r["a_event_id"], r["b_event_id"])
        for r in db.execute(
            "QUERY a FOLLOWED BY b LINKED BY context_id"
        ).df.collect()
    }
    assert shown == direct and len(shown) > 0
    db.close()


def test_on_snapshot_fires_before_bootstrap_completes(spark, tmp_path):
    """Ordering contract: the hook fires after the probe but before
    remember() returns — that window is what the overlap exploits."""
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"))
    db.store.registry.define("p", {"v": "int"})
    db.store.append_dataframe("p", _mk_events(spark, "p", 0, 50))
    seen = []
    db.materializer.on_snapshot = lambda: seen.append(
        db.materializer.exists("st2")
    )
    try:
        db.execute("REMEMBER QUERY p COUNT BY v AS st2")
    finally:
        db.materializer.on_snapshot = None
    # fired exactly once, and before the manifest (bootstrap commit) landed
    assert seen == [False]
    # refresh probes never fire the hook
    fired = []
    db.materializer.on_snapshot = lambda: fired.append(1)
    try:
        db.store.append_dataframe("p", _mk_events(spark, "p", 50, 80))
        db.execute("SHOW st2").df.collect()
        db.materializer.quiesce()
    finally:
        db.materializer.on_snapshot = None
    assert fired == []
    db.close()
