"""Reader-vs-compaction handover: the race the 30-min soak caught, pinned.

soak_local_r8.json recorded a reader thread dying with
FAILED_READ_FILE.FILE_NOT_EXIST mid-REPLAY: on the rename-based
``LocalStorage``, a compaction publish deletes the previous segment copy
the instant the compacted one goes live, so any Spark plan that listed
the old part files loses them at execute time. The reference parks
readers during segment handover (src/engine/core/compaction); our
zero-blocking equivalent is snapshot retention — ``grace_local_storage``
publishes into a fresh versioned prefix and spares the previously-live
copy for ``gc_grace_versions`` further publishes (Iceberg-style minimal
snapshot retention), so in-flight plans finish on the superseded copy.

These tests pin all three sides deterministically:
  1. the race is REAL on LocalStorage (plan -> compact -> collect fails),
  2. the grace backend survives the identical interleaving exactly,
  3. the window is one publish cycle — a plan that outlives it fails
     (read-repair: re-resolve and re-run), and a fresh read always sees
     the compacted copy.
"""

import pytest

from sneldb_spark.engine import SnelDB
from sneldb_spark.store.storage import grace_local_storage


def _fill(db, lo, hi):
    for i in range(lo, hi):
        db.execute(f'STORE t FOR c{i} PAYLOAD {{ "n": {i} }}')


def _build(spark, root, storage=None):
    db = SnelDB(spark, root, storage=storage)
    db.execute('DEFINE t FIELDS { "n": "u64" }')
    _fill(db, 0, 6)
    db.execute("FLUSH")
    _fill(db, 6, 12)
    db.execute("FLUSH")  # two segments -> compaction genuinely rewrites
    return db


def test_local_storage_loses_inflight_reader_to_compaction(spark, tmp_path):
    """The motivating defect: rename-based publish + concurrent reader.
    LOCAL must now be requested explicitly — engines default to grace."""
    from sneldb_spark.store.storage import LOCAL

    db = _build(spark, str(tmp_path / "db"), storage=LOCAL)
    df = db.execute("QUERY t").df  # plan lists the pre-compaction files
    db.store.compact("t")
    with pytest.raises(Exception, match="(?i)file|exist"):
        df.collect()


def test_grace_backend_survives_identical_interleaving(spark, tmp_path):
    root = str(tmp_path / "db")
    db = _build(spark, root, storage=grace_local_storage(root))
    df = db.execute("QUERY t").df
    db.store.compact("t")
    rows = df.collect()  # finishes on the superseded copy
    assert sorted(r["n"] for r in rows) == list(range(12))
    # a fresh read resolves the pointer to the compacted copy
    assert db.execute("QUERY t").df.count() == 12


def test_grace_window_is_one_publish_cycle(spark, tmp_path):
    root = str(tmp_path / "db")
    db = _build(spark, root, storage=grace_local_storage(root))
    df = db.execute("QUERY t").df
    db.store.compact("t")  # plan's copy superseded but spared (grace=1)
    db.store.compact("t")  # second publish pushes it out of the window
    with pytest.raises(Exception, match="(?i)file|exist"):
        df.collect()
    # read-repair: re-resolving gives a valid plan over the live copy
    assert db.execute("QUERY t").df.count() == 12


def test_create_engine_defaults_to_grace_backend(spark, tmp_path):
    """[storage] backend defaults to "grace" for config-built (served)
    engines; "local" opts back into the rename protocol."""
    from sneldb_spark.config import EngineConfig, create_engine, load_config
    from sneldb_spark.store.storage import LocalStorage, ObjectStoreStorage

    cfg = EngineConfig(data_dir=str(tmp_path / "srv"))
    db = create_engine(spark, cfg)
    assert isinstance(db.store.storage, ObjectStoreStorage)
    assert db.store.storage.gc_grace_versions == 1
    # the served engine survives the soak's interleaving
    db.execute('DEFINE t FIELDS { "n": "u64" }')
    _fill(db, 0, 6)
    db.execute("FLUSH")
    _fill(db, 6, 12)
    db.execute("FLUSH")
    df = db.execute("QUERY t").df
    db.store.compact("t")
    assert sorted(r["n"] for r in df.collect()) == list(range(12))

    cfg2 = load_config(
        {"engine": {"data_dir": str(tmp_path / "loc")}, "storage": {"backend": "local"}}
    )
    db2 = create_engine(spark, cfg2)
    assert isinstance(db2.store.storage, LocalStorage)

    with pytest.raises(ValueError, match="backend"):
        load_config(
            {"engine": {"data_dir": str(tmp_path / "x")}, "storage": {"backend": "s3"}}
        )


def test_recover_never_gcs_staging_above_live_pointer(tmp_path):
    """Regression (r11 soak, soak_seq lost ~10M stored rows): a
    compaction stages `dst.v(N+1)` over a long Spark write while SHOW's
    recover_dir runs concurrently. recover used to GC every version that
    was neither the pointer target, grace-kept, nor pinned — which
    includes the IN-PROGRESS staging (its number is above the live one),
    so the compact then published a base-less truncated copy. recover
    must leave numbers above the pointer alone; abandoned stagings are
    reclaimed by the next publish (whose GC runs after its flip)."""
    from sneldb_spark.store.storage import DirObjectClient, ObjectStoreStorage

    st = ObjectStoreStorage(DirObjectClient(str(tmp_path)), gc_grace_versions=1)
    dst = str(tmp_path / "data")
    # live copy at v1 via a normal publish
    stage = st.stage_path(dst)
    st.client.put(f"{stage}/base/part-0.parquet", b"v1")
    st.publish_dir(dst)
    assert st.resolve(dst).endswith(".v1")
    # a compaction is mid-write into v2 (partial staging)
    stage2 = st.stage_path(dst)
    assert stage2.endswith(".v2")
    st.client.put(f"{stage2}/base/part-0.parquet", b"half-written")
    # concurrent SHOW recover: must NOT delete the staging
    st.recover_dir(dst)
    assert st.client.list(stage2 + "/"), "recover deleted in-progress staging"
    # the compact finishes and publishes; the staged bytes survive intact
    st.client.put(f"{stage2}/base/part-1.parquet", b"rest")
    st.publish_dir(dst)
    assert st.resolve(dst).endswith(".v2")
    assert st.client.get(f"{stage2}/base/part-0.parquet") == b"half-written"
    # an ABANDONED staging (v3, creator crashed) survives recover too...
    stage3 = st.stage_path(dst)
    st.client.put(f"{stage3}/base/part-0.parquet", b"abandoned")
    st.recover_dir(dst)
    assert st.client.list(stage3 + "/")
    # ...and is reclaimed by the NEXT publish (flip first, then GC)
    stage4 = st.stage_path(dst)
    assert stage4.endswith(".v4")
    st.client.put(f"{stage4}/base/part-0.parquet", b"v4")
    st.publish_dir(dst)
    assert st.resolve(dst).endswith(".v4")
    assert not st.client.list(stage3 + "/"), "abandoned staging not reclaimed"


def test_recover_keeps_first_staging_over_raw_prefix(tmp_path):
    """Same race, pre-first-publish shape: the live copy is the raw
    prefix (REMEMBER wrote it directly, no pointer yet) and the FIRST
    compaction is staging .v1 — recover must leave it."""
    from sneldb_spark.store.storage import DirObjectClient, ObjectStoreStorage

    st = ObjectStoreStorage(DirObjectClient(str(tmp_path)), gc_grace_versions=1)
    dst = str(tmp_path / "data")
    st.client.put(f"{dst}/base/part-0.parquet", b"raw-live")
    stage = st.stage_path(dst)
    assert stage.endswith(".v1")
    st.client.put(f"{stage}/base/part-0.parquet", b"first-compact")
    st.recover_dir(dst)
    assert st.client.list(stage + "/"), "recover deleted first staging"
    st.publish_dir(dst)
    assert st.resolve(dst).endswith(".v1")


def test_compact_aborts_when_staging_lost(spark, tmp_path):
    """The materializer's completeness guard (belt behind the storage
    fix): if the staged base vanished mid-compact, publish must ABORT
    loudly with the live layout untouched — not flip to a truncated
    copy."""
    from sneldb_spark.errors import MaterializationError

    root = str(tmp_path / "db")
    db = _build(spark, root, storage=grace_local_storage(root))
    db.execute("REMEMBER QUERY t AS mseg")
    _fill(db, 12, 15)
    db.execute("FLUSH")
    assert db.execute("SHOW mseg").df.count() == 15
    assert db.materializer.quiesce("mseg") == []

    st = db.materializer.storage
    orig_walk = st.walk_parquet

    def lossy_walk(root_path):
        # simulate the staged rewrite being GC'd mid-write: a staging
        # prefix (data.vN/base) lists empty while everything else is
        # intact — the guard probes exactly walk_parquet(staging/base)
        if ".v" in root_path and root_path.endswith("/base"):
            return iter(())
        return orig_walk(root_path)

    st.walk_parquet = lossy_walk
    try:
        with pytest.raises(MaterializationError, match="lost its rewritten"):
            db.materializer.compact("mseg")
    finally:
        st.walk_parquet = orig_walk
    # live layout untouched, result still exact
    assert db.execute("SHOW mseg").df.count() == 15
    db.close()
