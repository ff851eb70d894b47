from sneldb_spark.commands.parser import parse_command

__all__ = ["parse_command"]
