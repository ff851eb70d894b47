"""Text analysis operators: quality scoring, token counting, fingerprinting,
language identification.

Everything here compiles to built-in Spark SQL expressions (regexp_count,
split, filter, transform, md5, ...) so the hot path stays inside
whole-stage codegen — no Python in the loop at any scale. Each function
takes and returns a DataFrame, adding columns; composition is left to the
caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\w+"

# Tiny, fixed stopword profiles for the n-gram/stopword language heuristic.
# Deliberately small so the same lists can be embedded in oracle SQL.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"),
}

PUNCT_PATTERN = r"[^\w\s]"
DEFAULT_STOPWORDS = LANG_PROFILES["en"]


def words_col(text: Column) -> Column:
    """Lower-cased word tokens (non-empty)."""
    return F.filter(F.split(F.lower(text), r"\W+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """BPE-ish regex token count (word runs; punctuation splits)."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case/punct/space
    normalized text (classic 'fingerprint clustering' key)."""
    return F.md5(F.regexp_replace(F.lower(text), r"\W+", ""))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    algorithm): Rabin-Karp rolling hashes of character k-grams over the
    normalized text, keeping each w-window's minimum. Two documents share
    fingerprints iff they share substrings of length >= k+w-1, which makes
    this robust to insertions/reordering where a whole-document digest
    (``fingerprint``) is not.

    Output: (id, fingerprints array<long>, n_fingerprints). Computed per
    Arrow batch in numpy (sliding-window dot + mod) — a narrow map, no
    shuffle, embarrassingly parallel at any scale.
    """
    import re as _re
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # Mersenne prime 2^31-1 keeps every intermediate product inside uint64:
    # power < 2^31, byte < 2^8 -> power*byte < 2^39, sum of k=8 terms < 2^42.
    B, M = np.uint64(257), np.uint64((1 << 31) - 1)
    powers = np.empty(k, dtype=np.uint64)
    acc = np.uint64(1)
    for i in range(k - 1, -1, -1):
        powers[i] = acc
        acc = (acc * B) % M
    ws_re = _re.compile(r"\W+")

    def fp_fn(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            ids, fps, counts = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                norm = ws_re.sub(" ", (text or "").lower()).strip()
                b = np.frombuffer(norm.encode(), dtype=np.uint8).astype(np.uint64)
                if len(b) < k:
                    sel = np.array([], dtype=np.int64)
                else:
                    grams = np.lib.stride_tricks.sliding_window_view(b, k)
                    hashes = (grams * powers[None, :] % M).sum(axis=1) % M
                    if len(hashes) <= window:
                        sel = np.unique(hashes).astype(np.int64)
                    else:
                        wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
                        sel = np.unique(wins.min(axis=1)).astype(np.int64)
                ids.append(doc_id)
                fps.append(sel)
                counts.append(len(sel))
            yield pd.DataFrame({"id": ids, "fingerprints": fps, "n_fingerprints": counts})

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("fingerprints", T.ArrayType(T.LongType())),
            T.StructField("n_fingerprints", T.LongType()),
        ]
    )
    from sneldb_spark.pipeline import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, text_col)).mapInPandas(
        fp_fn, schema=schema
    )


def quality_features(
    df: DataFrame, text_col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> DataFrame:
    """Add length / token / punctuation / stopword-ratio quality signals."""
    text = F.col(text_col)
    words = words_col(text)
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return (
        df.withColumn("q_chars", F.length(text))
        .withColumn("q_tokens", token_count(text))
        .withColumn("q_words", n_words)
        .withColumn(
            "q_avg_word_len",
            F.when(n_words > 0, (F.length(F.concat_ws("", words)) / n_words)),
        )
        .withColumn(
            "q_punct_ratio",
            F.when(
                F.length(text) > 0,
                F.regexp_count(text, F.lit(PUNCT_PATTERN)) / F.length(text),
            ),
        )
        .withColumn("q_stopword_ratio", F.when(n_words > 0, stop_hits / n_words))
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score each language by stopword hits,
    pick the max (zero evidence -> 'und'; ties resolve in profile order).
    Pure built-ins, so it runs as codegen'd expressions; at 100 TB this is
    a narrow map, no shuffle."""
    words = words_col(F.col(text_col))

    def hits(sw: tuple[str, ...]) -> Column:
        return F.size(F.filter(words, lambda w: w.isin(*sw)))

    scores = {lang: hits(sw) for lang, sw in LANG_PROFILES.items()}
    df = df.withColumn(
        "lang_scores", F.struct(*[scores[lang].alias(lang) for lang in LANG_PROFILES])
    )
    best = F.greatest(*[F.col(f"lang_scores.{lang}") for lang in LANG_PROFILES])
    pred = F.lit("und")
    # Deterministic preference order on ties: first profile wins.
    for lang in reversed(list(LANG_PROFILES)):
        pred = F.when(
            (F.col(f"lang_scores.{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred).drop("lang_scores")
