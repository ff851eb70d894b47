"""Checkout shim: the tool lives in the installable package now
(sneldb_spark/tools/wal_archive_manager.py — console script in pyproject.toml).
This file keeps `python tools/wal_archive_manager.py` and `from wal_archive_manager import ...`
(tests with tools/ on sys.path) working from a repo checkout."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sneldb_spark.tools.wal_archive_manager import *  # noqa: F401,F403
from sneldb_spark.tools.wal_archive_manager import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
