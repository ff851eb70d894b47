from sneldb_spark.plans.compiler import QueryCompiler

__all__ = ["QueryCompiler"]
