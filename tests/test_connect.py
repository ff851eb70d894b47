"""Spark Connect compatibility lane (VERDICT r6 #4).

The static audit always runs: it fails when someone adds a classic-only
API call (`sparkContext`, `df.rdd`, `_jvm`, `applyInPandasWithState`)
outside the documented compat table in tools/smoke_connect.py. The live
lane needs the Connect client deps (grpcio), absent in this container —
it drives the engine's batch path against a `remote("local[4]")`
session when they exist.
"""

import pytest


def test_classic_only_api_usage_matches_compat_table():
    from tools.smoke_connect import audit

    assert audit() == 0


def test_ensure_min_partitions_connect_fallback_paths():
    """The Connect fallback must survive a session whose sparkContext
    raises and whose shuffle-partitions conf is non-numeric."""
    from sneldb_spark.pipeline import ensure_min_partitions

    class FakeConf:
        def get(self, key, default=None):
            return "auto"  # AQE-style non-numeric value

    class FakeSession:
        conf = FakeConf()

        @property
        def sparkContext(self):
            raise Exception("Connect: no sparkContext")

    class FakeDF:
        sparkSession = FakeSession()

        @property
        def rdd(self):
            raise Exception("Connect: no rdd")

    df = FakeDF()
    # no rdd probe possible -> plan returned untouched, no crash
    assert ensure_min_partitions(df) is df


def test_connect_live_batch_path():
    pytest.importorskip(
        "grpc", reason="Spark Connect client deps (grpcio) not installed"
    )
    from tools.smoke_connect import live

    assert live() == 0
