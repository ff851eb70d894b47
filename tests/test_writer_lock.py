"""Cross-process writer lock tests."""
import os
import subprocess
import sys

import pytest


def test_second_process_writer_rejected(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path / "db")
    db = SnelDB(spark, root)
    db.execute('DEFINE t FIELDS { "v": "int" }')
    # a SECOND PROCESS opening the same root must be refused while we live
    code = (
        "import sys, os, fcntl\n"
        f"path = {os.path.join(root, '.writer.lock')!r}\n"
        "f = open(path, 'a+')\n"
        "try:\n"
        "    fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)\n"
        "    print('ACQUIRED')\n"
        "except OSError:\n"
        "    print('LOCKED')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert out.stdout.strip() == "LOCKED", out.stdout + out.stderr


def test_same_process_reopen_takes_over(spark, tmp_path):
    """The crash-restart pattern: a new engine on the same root in the
    SAME process takes the lock over (the old object is abandoned)."""
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path / "db")
    db1 = SnelDB(spark, root)
    db1.execute('DEFINE t FIELDS { "v": "int" }')
    db1.execute('STORE t FOR c PAYLOAD {"v": 1}')
    db1.execute("FLUSH")
    db2 = SnelDB(spark, root)  # no error
    assert db2.query("QUERY t").count() == 1


def test_superseded_writer_fails_loudly(spark, tmp_path):
    """ADVICE r5: after a same-process takeover the OLD engine must not
    keep flushing/compacting unaware — its writes raise, naming the
    takeover; the new engine owns the root. Reads on the old object stay
    allowed (stale-but-safe, like any snapshot)."""
    import pytest

    from sneldb_spark.engine import SnelDB
    from sneldb_spark.errors import SnelDBError

    root = str(tmp_path / "db")
    db1 = SnelDB(spark, root)
    db1.execute('DEFINE t FIELDS { "v": "int" }')
    db1.execute('STORE t FOR c PAYLOAD {"v": 1}')
    db1.execute("FLUSH")
    db2 = SnelDB(spark, root)  # takeover
    with pytest.raises(SnelDBError, match="taken over"):
        db1.store.store("t", "c2", {"v": 2})
    with pytest.raises(SnelDBError, match="taken over"):
        db1.store.flush()
    with pytest.raises(SnelDBError, match="taken over"):
        db1.store.compact("t")
    # the new owner works; data intact
    db2.execute('STORE t FOR c3 PAYLOAD {"v": 3}')
    db2.execute("FLUSH")
    assert db2.query("QUERY t").count() == 2
