"""Per-type append locks (r11): bulk appends of DIFFERENT types overlap as
independent Spark jobs; same-type appends and the compaction adopt window
still serialize. These tests drive the overlapped paths and assert no row
is lost or duplicated."""

from concurrent.futures import ThreadPoolExecutor


def _mk_frame(spark, et, lo, hi):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(
            F.concat(F.lit("c"), (F.col("id") % 7)).alias("context_id"),
            F.lit(et).alias("event_type"),
            (1_700_000_000 + F.col("id")).alias("timestamp"),
            F.col("id").alias("event_id"),
            (F.col("id") % 5).cast("int").alias("v"),
        )
    )


def test_concurrent_multi_type_appends_land_all_rows(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"))
    types = ["ta", "tb", "tc"]
    for et in types:
        db.store.registry.define(et, {"v": "int"})

    def one(et):
        db.store.append_dataframe(et, _mk_frame(spark, et, 0, 500))
        db.store.append_dataframe(et, _mk_frame(spark, et, 500, 800))

    with ThreadPoolExecutor(max_workers=3) as ex:
        for f in [ex.submit(one, et) for et in types]:
            f.result()
    for et in types:
        got = db.store.read(et)
        assert got.count() == 800
        assert got.select("event_id").distinct().count() == 800
    db.close()


def test_concurrent_append_vs_flush_same_type(spark, tmp_path):
    """A bulk append racing the flush path's commit of the SAME type must
    serialize (shared _temporary staging); every row from both lanes lands."""
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"))
    db.execute('DEFINE t FIELDS { "v": "int" }')
    for i in range(20):
        db.execute(f'STORE t FOR m{i} PAYLOAD {{"v": {i}}}')

    def bulk():
        db.store.append_dataframe("t", _mk_frame(spark, "t", 1000, 1400))

    def flush():
        db.execute("FLUSH")

    with ThreadPoolExecutor(max_workers=2) as ex:
        fb, ff = ex.submit(bulk), ex.submit(flush)
        fb.result(), ff.result()
    assert db.store.read("t").count() == 420
    db.close()


def test_concurrent_appends_vs_auto_compaction(spark, tmp_path):
    """Appends of other types while the background compactor flips one
    type: the adopt window takes flush + per-type locks, so nothing is
    dropped by the pointer flip and the other types' appends overlap."""
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"), auto_compact_files=2)
    for et in ("hot", "cold"):
        db.store.registry.define(et, {"v": "int"})
    # many small files on "hot" to make the compactor fire
    for i in range(4):
        db.store.append_dataframe("hot", _mk_frame(spark, "hot", i * 50, i * 50 + 50))

    def cold_appends():
        for i in range(3):
            db.store.append_dataframe(
                "cold", _mk_frame(spark, "cold", i * 100, i * 100 + 100)
            )

    with ThreadPoolExecutor(max_workers=1) as ex:
        f = ex.submit(cold_appends)
        assert db.store.quiesce_compaction() == []
        f.result()
    assert db.store.read("hot").count() == 200
    assert db.store.read("cold").count() == 300
    db.close()
