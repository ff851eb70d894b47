"""REMEMBER / SHOW: materialized query results with incremental refresh.

Mirrors the reference's materialization design (reference:
src/engine/materialize/, src/command/handlers/show/delta/): a stored result
plus a high-water mark `(timestamp, event_id)` over the *source* events.

- `REMEMBER <query> AS name` runs the query, persists the result as
  Parquet, and records the high-water mark of the scanned source. For a
  plain aggregate query it ALSO persists mergeable per-group partial
  state (see plans/aggregates.py).
- `SHOW name` refreshes first: for non-aggregate queries only the delta
  (`ts > hwm OR (ts = hwm AND id > hwm_id)`) is scanned, appended, and
  deduped by event_id — at 100 TB this is the difference between an
  incremental touch-up and a full rescan. Plain aggregate queries merge
  a delta partial aggregate into the stored state (reference:
  src/command/handlers/show/delta/refresher.rs) — a delta scan plus a
  state-sized shuffle, never a history rescan. Sequence results and
  group-LIMIT aggregates (where new rows can change WHICH groups
  qualify) recompute when (and only when) the high-water mark moved.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sneldb_spark.commands import ast
from sneldb_spark.commands.serde import query_from_json, query_to_json
from sneldb_spark.errors import MaterializationError


class Materializer:
    def __init__(self, engine, root: str):
        self.engine = engine
        self.root = os.path.join(root, "materialized")

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "manifest.json")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    # -- helpers ----------------------------------------------------------
    def _source_hwm(self, q: ast.QueryCommand) -> tuple[int, int]:
        """(max timestamp, max event_id) over the query's source types.
        Footer-stats + memtable probe (no Spark job) when available —
        this runs on EVERY SHOW, so it must stay metadata-cheap — with a
        full agg(max(...)) scan as the fallback."""
        hwm_ts, hwm_id = -1, -1
        for et in q.sequence.event_types:
            fast = self.engine.store.source_hwm(et)
            if fast is not None:
                hwm_ts = max(hwm_ts, fast[0])
                hwm_id = max(hwm_id, fast[1])
                continue
            try:
                df = self.engine.store.read(et)
            except Exception:
                continue
            row = df.agg(
                F.max("timestamp").alias("ts"), F.max("event_id").alias("id")
            ).collect()[0]
            if row["ts"] is not None:
                hwm_ts = max(hwm_ts, row["ts"])
                hwm_id = max(hwm_id, row["id"])
        return hwm_ts, hwm_id

    def _incrementable(self, q: ast.QueryCommand) -> bool:
        return not q.is_aggregate and not q.is_sequence and q.limit is None

    def _agg_incrementable(self, q: ast.QueryCommand, manifest: dict) -> bool:
        """Plain aggregates refresh by partial-state merge. Excluded:
        sequence aggregates (the match itself isn't mergeable), LIMIT
        (caps *groups*; a delta could add groups that should compete),
        and retention options (they filter event-shaped rows, not
        groups)."""
        return (
            q.is_aggregate
            and not q.is_sequence
            and q.limit is None
            and q.offset is None
            and manifest.get("max_rows") is None
            and manifest.get("max_age_seconds") is None
        )

    def _state_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "state")

    def _swap_in(self, df: DataFrame, path: str):
        """Overwrite `path` with `df` via write-to-tmp + rename, reading
        never sees a half-written directory."""
        tmp = path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)

    def _apply_retention(self, df: DataFrame, manifest: dict) -> DataFrame:
        """Retention per the reference's materialization limits: keep rows
        no older than max_age_seconds, and at most max_rows (newest first).
        Only meaningful for event-shaped (non-aggregate) results."""
        max_age = manifest.get("max_age_seconds")
        max_rows = manifest.get("max_rows")
        if "timestamp" not in df.columns:
            return df
        if max_age is not None:
            import time as _time

            cutoff = int(_time.time()) - int(max_age)
            df = df.where(F.col("timestamp") >= F.lit(cutoff))
        if max_rows is not None:
            df = (
                df.orderBy(F.col("timestamp").desc(), F.col("event_id").desc())
                .limit(int(max_rows))
            )
        return df

    # -- REMEMBER ---------------------------------------------------------
    def remember(
        self,
        name: str,
        q: ast.QueryCommand,
        max_rows: int | None = None,
        max_age_seconds: int | None = None,
    ):
        if self.exists(name):
            raise MaterializationError(f"materialization {name!r} already exists")
        manifest = {
            "name": name,
            "query": query_to_json(q),
            "hwm_ts": -1,
            "hwm_id": -1,
            "max_rows": max_rows,
            "max_age_seconds": max_age_seconds,
        }
        path = os.path.join(self._dir(name), "data")
        if self._agg_incrementable(q, manifest):
            # Materialize the RESULT from the partial state's finalize so
            # the remembered values and every later state-merge refresh go
            # through the one estimator — with approx COUNT UNIQUE the
            # query path (approx_count_distinct) and the sketch estimate
            # differ slightly, and a refresh must never silently change
            # which one the user is looking at.
            from sneldb_spark.plans.aggregates import finalize_partial_state

            approx = self.engine.compiler.approx_count_unique
            state, keys = self.engine.compiler.compile_aggregate_partial(q)
            state.write.mode("overwrite").parquet(self._state_path(name))
            manifest["state_keys"] = keys
            stored_state = self.engine.spark.read.parquet(self._state_path(name))
            finalize_partial_state(
                stored_state, q.aggs, keys, approx_unique=approx
            ).write.mode("overwrite").parquet(path)
        else:
            df = self._apply_retention(
                self.engine.compiler.compile_query(q), manifest
            )
            df.write.mode("overwrite").parquet(path)
        hwm_ts, hwm_id = self._source_hwm(q)
        manifest["hwm_ts"], manifest["hwm_id"] = hwm_ts, hwm_id
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, indent=1)
        return self.engine.spark.read.parquet(path).count()

    def _merge_agg_delta(self, name: str, q, manifest: dict) -> DataFrame:
        """Aggregate ONLY the rows past the high-water mark, merge into the
        stored per-group state, persist the new state, and return it. The
        history scan is replaced by a delta scan whose hwm predicate
        reaches the Parquet scan (pushdown-tested)."""
        from sneldb_spark.plans.aggregates import merge_partial_states

        keys = manifest["state_keys"]
        delta, _ = self.engine.compiler.compile_aggregate_partial(
            q, hwm=(manifest["hwm_ts"], manifest["hwm_id"])
        )
        spath = self._state_path(name)
        stored = self.engine.spark.read.parquet(spath)
        merged = merge_partial_states(
            stored.unionByName(delta), q.aggs, keys,
            approx_unique=self.engine.compiler.approx_count_unique,
        )
        self._swap_in(merged, spath)
        return self.engine.spark.read.parquet(spath)

    # -- SHOW -------------------------------------------------------------
    def show(self, name: str) -> DataFrame:
        if not self.exists(name):
            raise MaterializationError(f"Materialization '{name}' not found")
        with open(self._manifest_path(name)) as f:
            manifest = json.load(f)
        q = query_from_json(manifest["query"])
        path = os.path.join(self._dir(name), "data")

        cur_ts, cur_id = self._source_hwm(q)
        stale = (cur_ts, cur_id) != (manifest["hwm_ts"], manifest["hwm_id"])

        if stale and self._incrementable(q):
            hwm_ts, hwm_id = manifest["hwm_ts"], manifest["hwm_id"]
            delta_df = self.engine.compiler.compile_query(q).where(
                (F.col("timestamp") > F.lit(hwm_ts))
                | (
                    (F.col("timestamp") == F.lit(hwm_ts))
                    & (F.col("event_id") > F.lit(hwm_id))
                )
            )
            stored = self.engine.spark.read.parquet(path)
            merged = self._apply_retention(
                stored.unionByName(delta_df).dropDuplicates(["event_id"]), manifest
            )
            self._swap_in(merged, path)
        elif stale and self._agg_incrementable(q, manifest) and manifest.get(
            "state_keys"
        ) is not None and os.path.exists(self._state_path(name)):
            merged_state = self._merge_agg_delta(name, q, manifest)
            from sneldb_spark.plans.aggregates import finalize_partial_state

            self._swap_in(
                finalize_partial_state(
                    merged_state, q.aggs, manifest["state_keys"],
                    approx_unique=self.engine.compiler.approx_count_unique,
                ),
                path,
            )
        elif stale:
            df = self.engine.compiler.compile_query(q)
            self._swap_in(df, path)

        if stale:
            manifest["hwm_ts"], manifest["hwm_id"] = cur_ts, cur_id
            with open(self._manifest_path(name), "w") as f:
                json.dump(manifest, f, indent=1)
        return self.engine.spark.read.parquet(path)
