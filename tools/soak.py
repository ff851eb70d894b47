"""Checkout shim: the tool lives in the installable package now
(sneldb_spark/tools/soak.py — console script in pyproject.toml).
This file keeps `python tools/soak.py` and `from soak import ...`
(tests with tools/ on sys.path) working from a repo checkout."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sneldb_spark.tools.soak import *  # noqa: F401,F403
from sneldb_spark.tools.soak import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
