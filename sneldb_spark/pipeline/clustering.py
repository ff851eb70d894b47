"""Euclidean k-means (Lloyd's) over an embedding column.

Corpus clustering is a curation staple — domain discovery, cluster-
balanced sampling, SemDeDup's first stage all start from a k-means over
document embeddings. The IVF coarse quantizer in `similarity.py` is the
spherical (cosine/argmax) cousin tuned for ANN lists; this module is the
classic squared-Euclidean Lloyd iteration, implemented so that the whole
loop is JVM-side whole-stage codegen — no Python workers at all:

- **assignment**: the k current centroids are baked into one literal
  expression per pass; squared distance is a sequential
  ``aggregate(zip_with(vec, centroid, (x,c) -> (x-c)^2))`` fold and the
  winning cluster is ``array_min`` over (distance, cluster-id) structs —
  a narrow map over the scan, no shuffle, ties break to the lowest
  cluster id.
- **update**: per-dimension means via ``avg(vec[i])`` grouped by the
  assigned cluster — k*(d+1) aggregate cells, map-side combined, so one
  small shuffle per iteration and only O(k*d) ever reaches the driver.
  (No posexplode: the d-way column fan-out happens inside codegen.)

At 100 TB each Lloyd round is one full scan (embarrassingly parallel)
plus a k*d-cell aggregate — the same shape MLlib uses, with centroid
state always driver-resident and tiny.

Determinism / oracle story: init is the k lowest-id vectors (no RNG),
and after every update each centroid coordinate is rounded to
``round_digits`` decimals. Rounding pins the iteration bit-for-bit
across engines (Spark's distributed sum order vs a sequential SQL
engine differ only below the rounding grain), so an unrolled SQL
transcription of the same rounds lands on identical assignments — the
property the driver's exact-oracle gate checks.

Reference parity note: the reference engine has no clustering operator;
this extends the training-data-pipeline surface (SURVEY §6) alongside
SemDeDup/IVF, which both consume exactly this kind of coarse partition.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist(vec: Column, centroid: Column) -> Column:
    """Sequential-fold squared Euclidean distance to a centroid array
    (matches a SQL engine's left-to-right list fold bit-for-bit)."""
    return F.aggregate(
        F.zip_with(vec, centroid, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def assign_clusters(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
    dist_col: Optional[str] = None,
    round_digits: int = 6,
) -> DataFrame:
    """Tag every row with the index of its nearest centroid (squared
    Euclidean; ties to the lowest index). Pure codegen map — no shuffle,
    no Python. Distances are rounded to `round_digits` before the argmin
    so sub-rounding float noise becomes an exact tie (broken by cluster
    id) in every engine.

    The k centroids travel as ONE nested-array Catalyst literal (not
    k*d individual literal nodes), keeping the expression tree — and
    therefore whole-stage codegen time — small and independent of k*d."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(cents, lambda cvec: _sqdist(vec, cvec))
    best = F.array_min(
        F.zip_with(
            dists,
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda d, i: F.struct(
                F.round(d, round_digits).alias("d"), i.cast("int").alias("c")
            ),
        )
    )
    out = df.withColumn(out_col, best["c"])
    if dist_col is not None:
        out = out.withColumn(dist_col, best["d"])
    return out


def _plusplus_seed(
    src: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> list[list[float]]:
    """Deterministic k-means++ seeding (opt-in via ``kmeans(init=)``).

    Classic k-means++ draws each next centroid with probability
    proportional to D^2 (distance to the nearest chosen centroid); here
    the draw is derandomized with the exponential-race trick — pick the
    row minimizing ``-ln(u) / D^2`` where ``u in (0,1)`` comes from
    ``md5(id || ':' || draw_index)``, the same engine-portable
    hash-uniform the sampling family uses. Mixing the draw index into
    the hash gives every draw a FRESH uniform per row (a fixed
    ``md5(id)`` would make successive draws strongly correlated — a row
    with u near 1 wins nearly regardless of D^2 on every later draw),
    and clamping u strictly below 1.0 keeps ``-ln(u) > 0`` so no row is
    an unconditional winner. One weighted draw is one ``TakeOrdered(1)``
    pass (no full sort, no RNG state, same result on any
    engine/partitioning), so seeding costs k-1 corpus passes — opt-in
    because the default lowest-id init is what the driver gate's SQL
    oracle transcribes. Spread-out seeds matter at scale: IVF list
    balance and fewer Lloyd rounds to convergence (k-means++, Arthur &
    Vassilvitskii SODA 2007 — the O(log k) approximation guarantee is in
    expectation over the randomized draw; the derandomized race keeps
    the D^2-proportional shape while staying reproducible).

    Note the rounding grain: candidate distances are computed against
    ROUNDED centroid coordinates and themselves rounded to
    ``round_digits``, so points within the rounding grain of a chosen
    centroid score D^2 = 0 and are excluded from later draws — at the
    default 1e-6 grain this only merges effective duplicates."""
    first = src.orderBy(F.col(id_col).asc()).limit(1).collect()
    if not first:
        raise ValueError("kmeans: empty input")
    cents = [[round(float(x), round_digits) for x in first[0][vec_col]]]
    while len(cents) < k:
        scored = assign_clusters(
            src, cents, vec_col=vec_col, dist_col="__d2",
            round_digits=round_digits,
        )
        # u in (0,1): 15 hex chars of md5(id:draw) scaled, clamped below
        # 1.0 (the 60-bit/double cast can round to exactly 1.0); the
        # +1e-300 floor avoids ln(0) at the other end
        u = F.least(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit(f":{len(cents)}"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**15)),
            F.lit(1.0 - 2.0**-53),
        )
        key = -F.log(u + F.lit(1e-300)) / F.col("__d2")
        row = (
            scored.where(F.col("__d2") > 0)
            .orderBy(key.asc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not row:  # fewer distinct points than k: fall back to padding
            pad = src.orderBy(F.col(id_col).asc()).limit(k).collect()
            have = {tuple(c) for c in cents}
            for r in pad:  # prefer coordinates not already chosen
                if len(cents) >= k:
                    break
                coord = [round(float(x), round_digits) for x in r[vec_col]]
                if tuple(coord) in have:
                    continue
                have.add(tuple(coord))
                cents.append(coord)
            for r in pad:  # truly fewer distinct coords than k: duplicate
                if len(cents) >= k:
                    break
                cents.append(
                    [round(float(x), round_digits) for x in r[vec_col]]
                )
            break
        cents.append([round(float(x), round_digits) for x in row[0][vec_col]])
    return cents


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    cache: bool = True,
    init: str = "lowest_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means with deterministic seeding. Returns
    ``(df + cluster column, final centroids)``.

    Init: ``init="lowest_id"`` (default) seeds with the k lowest-`id_col`
    vectors — the no-RNG recipe the driver gate's SQL oracle
    transcribes; ``init="plusplus"`` runs the deterministic k-means++
    seeding (see :func:`_plusplus_seed`) for spread-out seeds at the
    cost of k-1 extra passes. Coordinates rounded to
    `round_digits` either way. Each round assigns (codegen map) then recomputes
    centroids as per-dimension means rounded to `round_digits`; an
    emptied cluster keeps its previous centroid. At most `iters` rounds,
    then one final assignment pass against the last centroids. A round
    whose recomputed centroids equal the previous set exactly (they are
    rounded, so equality is well-defined) ends the loop early: every
    further round would reproduce the same assignment and the same
    means, so the result is bit-identical to running all `iters` rounds
    while skipping the remaining corpus passes.

    With `cache` (default), the id/vector projection is persisted for
    the duration of the loop so each Lloyd round reads the cached
    columns instead of rescanning the source — at 100 TB that is the
    difference between one scan and `iters` scans. The returned
    DataFrame is built against the ORIGINAL input, so the cache can be
    (and is) released before returning."""
    if init not in ("lowest_id", "plusplus"):
        raise ValueError(f"kmeans: unknown init {init!r}")
    src = df.select(id_col, vec_col)
    if cache:
        src = src.persist()
    try:
        if init == "plusplus":
            cents = _plusplus_seed(src, k, id_col, vec_col, round_digits)
        else:
            seed = src.orderBy(F.col(id_col).asc()).limit(k).collect()
            cents = [
                [round(float(x), round_digits) for x in row[vec_col]]
                for row in seed
            ]
        dim = len(cents[0])
        vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        for _ in range(iters):
            assigned = assign_clusters(
                src, cents, vec_col=vec_col, round_digits=round_digits
            )
            stats = (
                assigned.groupBy("cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.round(F.avg(vec[i]), round_digits).alias(f"m{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            new = [list(c) for c in cents]  # empty clusters keep their centroid
            for row in stats:
                new[row["cluster"]] = [float(row[f"m{i}"]) for i in range(dim)]
            if new == cents:  # converged: further rounds are no-ops
                break
            cents = new
    finally:
        if cache:
            src.unpersist()
    return (
        assign_clusters(
            df, cents, vec_col=vec_col, dist_col="sqdist",
            round_digits=round_digits,
        ),
        cents,
    )


def kmeans_summary(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    init: str = "lowest_id",
) -> DataFrame:
    """Per-cluster size and inertia (sum of squared distance to the final
    centroid, rounded) — the gate-friendly rollup of :func:`kmeans`."""
    assigned, _ = kmeans(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits, init=init,
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round(F.col("sqdist"), round_digits)), 3).alias(
                "inertia"
            ),
        )
        .select(F.col("cluster").cast("int").alias("cluster"), "n", "inertia")
    )
