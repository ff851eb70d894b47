from sneldb_spark.store.event_store import EventStore

__all__ = ["EventStore"]
