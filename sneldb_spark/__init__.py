"""sneldb_spark — a PySpark-native event analytics engine.

A brand-new implementation of the query and data-processing capabilities of
the SnelDB reference engine (sneldb/sneldb), re-expressed Spark-first:

- the command language (DEFINE / STORE / QUERY / REPLAY / COMPARE / PLOT /
  REMEMBER / SHOW / FLUSH / BATCH) parses to a small AST;
- the AST compiles to a declarative DataFrame plan (Catalyst does predicate
  pushdown, column pruning, partial aggregation, shuffle planning);
- storage is Parquet per event type, partitioned by ingest date, fed by a
  batch or Structured Streaming ingest path with strict schema validation;
- sequence queries (FOLLOWED BY / PRECEDED BY) are as-of joins built from a
  single shuffle + window, not a custom engine.

Beyond the reference surface, `sneldb_spark.pipeline` adds large-scale
training-data operators: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, text analysis, and
multimodal column plumbing.
"""

from sneldb_spark.auth import AuthConfig, AuthManager
from sneldb_spark.client import SnelDBClient
from sneldb_spark.config import create_engine, load_config, serve
from sneldb_spark.engine import SnelDB
from sneldb_spark.session import get_spark

__all__ = [
    "SnelDB",
    "SnelDBClient",
    "get_spark",
    "AuthManager",
    "AuthConfig",
    "load_config",
    "create_engine",
    "serve",
]
__version__ = "0.1.0"
