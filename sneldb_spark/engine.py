"""SnelDB facade: execute command text against the Spark-backed engine.

The equivalent of the reference's dispatcher + handlers
(reference: src/command/dispatcher.rs:30-69) — parse, route, and run.
Results carry a DataFrame for read commands so callers stay lazy/distributed;
nothing here collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from sneldb_spark.commands import ast
from sneldb_spark.commands.parser import parse_command
from sneldb_spark.errors import SnelDBError
from sneldb_spark.plans.compiler import QueryCompiler, TimeConfig
from sneldb_spark.store.event_store import EventStore
from sneldb_spark.store.materialize import Materializer


@dataclass
class Result:
    ok: bool
    df: Optional[DataFrame] = None
    message: str = ""

    def rows(self) -> list:
        return self.df.collect() if self.df is not None else []


class SnelDB:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        clock=None,
        time_config: TimeConfig | None = None,
    ):
        self.spark = spark
        self.root = root
        self.store = EventStore(spark, root, clock=clock)
        self.compiler = QueryCompiler(
            source=self.store.read,
            schema_lookup=lambda et: (
                self.store.registry.get(et) if self.store.registry.has(et) else None
            ),
            time_config=time_config,
        )
        self.materializer = Materializer(self, root)

    # -- public API -------------------------------------------------------
    def execute(self, text: str) -> Result:
        cmd = parse_command(text)
        return self.execute_command(cmd)

    def try_execute(self, text: str) -> Result:
        try:
            return self.execute(text)
        except SnelDBError as e:
            return Result(ok=False, message=str(e))

    def query(self, text: str) -> DataFrame:
        """Parse+compile a read command, returning the DataFrame."""
        cmd = parse_command(text)
        return self.compiler.compile(cmd)

    # -- dispatch ---------------------------------------------------------
    def execute_command(self, cmd: ast.Command) -> Result:
        if isinstance(cmd, ast.DefineCommand):
            schema = self.store.registry.define(cmd.event_type, cmd.fields, cmd.version)
            return Result(ok=True, message=f"defined {schema.uid}")
        if isinstance(cmd, ast.StoreCommand):
            self.store.store(cmd.event_type, cmd.context_id, cmd.payload)
            return Result(ok=True, message="stored")
        if isinstance(cmd, (ast.QueryCommand, ast.ReplayCommand, ast.CompareCommand)):
            return Result(ok=True, df=self.compiler.compile(cmd))
        if isinstance(cmd, ast.RememberCommand):
            self.store.flush()
            self.materializer.remember(cmd.name, cmd.query)
            return Result(ok=True, message=f"remembered {cmd.name}")
        if isinstance(cmd, ast.ShowCommand):
            self.store.flush()
            return Result(ok=True, df=self.materializer.show(cmd.name))
        if isinstance(cmd, ast.FlushCommand):
            self.store.flush()
            return Result(ok=True, message="flushed")
        if isinstance(cmd, ast.PingCommand):
            return Result(ok=True, message="PONG")
        if isinstance(cmd, ast.BatchCommand):
            last = Result(ok=True)
            for sub in cmd.commands:
                last = self.execute_command(sub)
            return last
        raise SnelDBError(f"unhandled command type: {type(cmd).__name__}")
