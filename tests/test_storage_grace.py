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
