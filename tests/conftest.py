import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sneldb_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sneldb-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/sneldb-test-warehouse"},
    )
    yield s


@pytest.fixture()
def engine(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    clock = {"now": 1_700_000_000}

    def tick():
        clock["now"] += 1
        return clock["now"]

    root = str(tmp_path / "db")
    storage = None
    if os.environ.get("SNELDB_TEST_STORAGE") == "object":
        # opt-in lane: run every engine-fixture test against the
        # pointer-flip object backend instead of POSIX renames
        # (SNELDB_TEST_STORAGE=object python -m pytest tests/)
        from sneldb_spark.store.storage import DirObjectClient, ObjectStoreStorage

        storage = ObjectStoreStorage(DirObjectClient(root))
    db = SnelDB(spark, root, clock=tick, storage=storage)
    db._test_clock = clock
    return db
