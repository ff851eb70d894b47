"""Training-sequence shaping: document chunking and sequence packing.

Two operators a training-data pipeline runs between curation and the
tokenizer:

- ``chunk_documents``: split each document into overlapping token-window
  chunks (the RAG / long-context pretraining shape). Pure codegen —
  tokenize with ``regexp_extract_all``, emit one row per window via
  ``explode(sequence(...))``, rebuild chunk text with ``slice`` +
  ``array_join``. No shuffle at any scale: each input row expands
  locally into its chunks.

- ``pack_sequences``: assign every document to a fixed-token-budget bin
  (the "sequence packing" step that turns variable-length docs into
  fixed-size training rows). The assignment is a deterministic
  contiguous fill: within a shard, docs ordered by id fill bins in
  order, each doc belonging to the bin where its first token lands.
  Sharding bounds the window: the running sum partitions by
  ``pmod(doc_id, num_shards)``, so at 100 TB there are ``num_shards``
  independent windows instead of one global ordered window (a global
  cumsum would serialize on a single partition — the classic
  scale-killer). One shuffle on the shard key, O(1) state per window
  row.

Both contracts are exactly reproducible in ANSI SQL (window cumsum /
unnest-range), so they ship with full value-hash oracles.

Reference parity note: the reference engine (sneldb) has no
tokenizer-facing operators; these are north-star extensions per the
build brief, shaped like the curation ops in `pipeline/text.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sneldb_spark.pipeline.text import TOKEN_PATTERN


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping windows of ``chunk_tokens``
    tokens with stride ``chunk_tokens - overlap``.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``;
    starts are ``0, stride, 2*stride, ...`` while the start index is
    inside the document, so every token belongs to at least one chunk
    and consecutive chunks share ``overlap`` tokens. Documents with no
    tokens produce no chunks.

    Output: (id_col, chunk_idx, start_token, chunk_len, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
    n = F.size("_toks")
    # last chunk start = largest multiple of stride < n  →  (n-1) // stride
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .where(n > 0)
        .select(
            id_col,
            "_toks",
            n.alias("_n"),
            F.explode(
                F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("start_token"),
            F.least(
                F.col("_n") - F.col("chunk_idx") * stride, F.lit(chunk_tokens)
            ).cast("long").alias("chunk_len"),
            F.array_join(
                F.slice(
                    "_toks", F.col("chunk_idx") * stride + 1, chunk_tokens
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 512,
    num_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic contiguous-fill packing: within shard
    ``pmod(doc_id, num_shards)``, docs ordered by id fill
    ``budget_tokens``-sized bins; a doc belongs to the bin where its
    first token lands (``bin_seq = floor(exclusive_cumsum / budget)``).

    A doc whose tokens straddle a bin boundary is flagged
    ``spans_boundary`` — the trainer decides whether to split or drop
    it; the assignment itself stays a pure function of (ids, token
    counts), reproducible across engines and partitionings.

    Output: (id_col, shard, bin_seq, n_tokens, offset_in_bin,
    spans_boundary). Global bin identity is (shard, bin_seq).
    """
    shard = F.pmod(F.col(id_col), F.lit(num_shards)).cast("int")
    n_tokens = F.regexp_count(F.col(text_col), F.lit(TOKEN_PATTERN))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            shard.alias("shard"),
            n_tokens.cast("long").alias("n_tokens"),
        )
        .withColumn("_incl", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            F.floor((F.col("_incl") - F.col("n_tokens")) / budget_tokens)
            .cast("long")
            .alias("bin_seq"),
            "n_tokens",
            ((F.col("_incl") - F.col("n_tokens")) % budget_tokens)
            .cast("long")
            .alias("offset_in_bin"),
            (
                (F.col("_incl") - F.col("n_tokens")) % budget_tokens
                + F.col("n_tokens")
                > budget_tokens
            ).alias("spans_boundary"),
        )
    )
