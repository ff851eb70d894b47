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

import math
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


def _centroid_literal(centroids: Sequence[Sequence[float]]) -> Column:
    """The k×d centroid matrix as ONE nested-array double literal.

    Built as a single SQL expression string parsed JVM-side rather than
    ``F.lit(nested_list)``: PySpark's lit() recurses into Python lists
    with one py4j call per element, which measured ~0.5 s PER CALL at
    k·d = 512 — paid again every Lloyd round since the literal changes.
    ``repr(float)`` round-trips exactly (shortest-repr ↔
    Double.parseDouble are both correctly rounded), so the parsed
    literal is bit-identical to the lit() one; non-finite coordinates
    (impossible for means of finite vectors, kept as a guard) fall back
    to the slow exact path."""
    vals = [[float(x) for x in c] for c in centroids]
    if all(math.isfinite(x) for c in vals for x in c):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(x) + "D" for x in c) + ")"
                for c in vals
            )
            + ")"
        )
    return F.lit(vals)


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
    cents = _centroid_literal(centroids)
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


def parallel_seed(
    df: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    metric: str = "sq_euclidean",
    rounds: int = 5,
    oversample: int | None = None,
) -> "np.ndarray":
    """Deterministic k-means|| seeding (Bahmani et al., "Scalable
    k-means++", VLDB 2012) — the O(log n)-round alternative to
    k-means++'s k-1 sequential corpus scans, for large k (IVF nlist in
    the thousands).

    Each round draws ``oversample`` (default 2k) candidates at once with
    probability proportional to D (cosine) / D^2 (euclidean, via the
    squared distance), instead of one: the Bernoulli sampling of the
    paper is derandomized with the same md5-keyed exponential race the
    ++ seeders use, generalized to a WITHOUT-REPLACEMENT batch draw
    (Efraimidis & Spirakis 2006: top-l rows by ``-ln(u)/weight`` is an
    exact weight-proportional sample of l) — so one round is one Arrow
    scan + a distributed TakeOrdered(l), no RNG state, no cost-sum
    reduction whose float ordering could differ across partitionings.
    After ``rounds`` rounds the ~l*rounds candidates are weighted by a
    one-scan nearest-candidate count and reduced to k seeds with a
    driver-side weighted ++ race over the candidate matrix.

    Cost: round r scores the corpus against the |C| = 1 + l*(r-1)
    candidates accumulated so far, so the total work is
    O(rounds^2 * l / 2) corpus-row GEMM columns — for k=4096 that is
    ~10 scans instead of the 4095 sequential scans ++ would need, at the
    price of wider per-batch GEMMs in the later rounds.

    metric: "sq_euclidean" (rows as-is, D^2 race weights) or "cosine"
    (rows and returned seeds L2-normalized, D = 1 - max cosine). Fewer
    distinct rows than k pads from the lowest-id vectors (the default
    seeding recipe). Returns a (k, dim) float64 matrix."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from sneldb_spark.pipeline import ensure_min_partitions

    if metric not in ("sq_euclidean", "cosine"):
        raise ValueError(f"parallel_seed: unknown metric {metric!r}")
    l = int(oversample) if oversample else 2 * k

    def _prep(m: np.ndarray) -> np.ndarray:
        if metric == "cosine":
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return m / n
        return m

    def _dists(xp: np.ndarray, cents: np.ndarray) -> np.ndarray:
        """Per-row distance to the nearest of `cents` (race weight:
        squared euclidean, or 1 - max cosine). Rounded to a fixed grain:
        BLAS dot-product summation order varies with matrix shape, so
        the same row in a different Arrow batch can differ in the last
        ulp — rounding (12 decimals, far above float64 noise, far below
        meaningful distance differences) keeps the race and the weight
        assignment partition-layout independent, the same discipline as
        kmeans' round_digits."""
        if metric == "cosine":
            d = 1.0 - (xp @ cents.T).max(axis=1)
        else:
            sq = (
                (xp * xp).sum(axis=1)[:, None]
                - 2.0 * (xp @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            d = sq.min(axis=1)
        return np.round(np.clip(d, 0.0, None), 12)

    def _u(ids, tag: str) -> "np.ndarray":
        # 15 hex chars of md5("<id>:<tag>") / 16^15, clamped below 1.0 —
        # the engine-portable uniform every derandomized draw here uses
        vals = np.fromiter(
            (
                int(hashlib.md5(f"{i}:{tag}".encode()).hexdigest()[:15], 16)
                / float(16**15)
                for i in ids
            ),
            dtype=np.float64,
            count=len(ids),
        )
        return np.minimum(vals, 1.0 - 2.0**-53)

    first = (
        df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(1).toPandas()
    )
    if not len(first):
        raise ValueError("parallel_seed: empty input")
    cents = _prep(np.array([np.asarray(first[vec_col][0], dtype=np.float64)]))
    cand_ids = [int(first[id_col][0])]  # parallel to cents rows
    chosen_ids = set(cand_ids)

    src = ensure_min_partitions(df.select(id_col, vec_col))
    cand_schema = T.StructType(
        [
            T.StructField("key", T.DoubleType(), False),
            T.StructField("cid", T.LongType(), False),
            T.StructField("v", T.ArrayType(T.DoubleType()), False),
        ]
    )

    for r in range(1, rounds + 1):
        chosen = cents

        def score(
            batches, chosen=chosen, r=r
        ):
            for pdf in batches:
                if not len(pdf):
                    continue
                raw = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                d = _dists(_prep(raw), chosen)
                u = _u(pdf[id_col], f"p{r}")
                with np.errstate(divide="ignore"):
                    key = np.where(d > 1e-12, -np.log(u + 1e-300) / d, np.inf)
                fin = np.flatnonzero(np.isfinite(key))
                if not len(fin):
                    continue
                # local prune: the global top-l is a subset of each
                # batch's top-l (same lexicographic (key, cid) order the
                # final TakeOrdered applies)
                ids = pdf[id_col].to_numpy()[fin]
                order = np.lexsort((ids, key[fin]))[:l]
                keep = fin[order]
                yield pd.DataFrame(
                    {
                        "key": key[keep],
                        "cid": ids[order].astype(np.int64),
                        "v": [raw[j].tolist() for j in keep],
                    }
                )

        cand = (
            src.mapInPandas(score, schema=cand_schema)
            .orderBy(F.col("key").asc(), F.col("cid").asc())
            .limit(l)
            .toPandas()
        )
        if not len(cand):
            break  # nothing left at positive distance
        fresh = [
            (int(c), np.asarray(v, dtype=np.float64))
            for c, v in zip(cand["cid"], cand["v"])
            if int(c) not in chosen_ids
        ]
        if not fresh:
            break
        chosen_ids.update(c for c, _ in fresh)
        cand_ids.extend(c for c, _ in fresh)
        cents = np.vstack([cents, _prep(np.array([v for _, v in fresh]))])

    # -- weight pass: corpus rows per nearest candidate ---------------------
    C = cents
    wschema = T.StructType(
        [
            T.StructField("cl", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )

    def wcount(batches, C=C):
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            xp = _prep(raw)
            # same 12-decimal grain as _dists: an ulp tie must resolve
            # to the same (lowest-index) candidate in every batch layout
            if metric == "cosine":
                asn = np.round(xp @ C.T, 12).argmax(axis=1)
            else:
                sq = (
                    (xp * xp).sum(axis=1)[:, None]
                    - 2.0 * (xp @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                asn = np.round(sq, 12).argmin(axis=1)
            cnt = np.bincount(asn, minlength=len(C))
            nz = np.flatnonzero(cnt)
            yield pd.DataFrame({"cl": nz.astype(np.int32), "n": cnt[nz]})

    wpdf = src.mapInPandas(wcount, schema=wschema).groupBy("cl").agg(
        F.sum("n").alias("n")
    ).toPandas()
    W = np.ones(len(C), dtype=np.float64)
    for cl, n in zip(wpdf["cl"], wpdf["n"]):
        W[int(cl)] = max(float(n), 1.0)

    # -- driver-side weighted ++ race over the candidates -------------------
    ids = np.asarray(cand_ids, dtype=np.int64)
    start = int(np.argmin(ids))  # lowest candidate id starts (no RNG)
    seeds = [start]
    mind = _dists(C, C[start:start + 1])
    for j in range(1, min(k, len(C))):
        u = _u(ids, f"f{j}")
        with np.errstate(divide="ignore"):
            key = np.where(
                mind > 1e-12, -np.log(u + 1e-300) / (W * mind), np.inf
            )
        if not np.isfinite(key.min()):
            break
        i = int(np.lexsort((ids, key))[0])
        seeds.append(i)
        mind = np.minimum(mind, _dists(C, C[i:i + 1]))
    out = C[seeds]

    if len(out) < k:
        # fewer distinct candidates than k: pad from the lowest-id corpus
        # vectors (the default seeding recipe), skipping exact duplicates
        # of already-chosen coordinates first
        pad = (
            df.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(k)
            .toPandas()
        )
        pvecs = _prep(
            np.array([np.asarray(v, dtype=np.float64) for v in pad[vec_col]])
        ) if len(pad) else np.zeros((0, out.shape[1]))
        have = {tuple(row) for row in out}
        for row in pvecs:
            if len(out) >= k:
                break
            if tuple(row) in have:
                continue
            have.add(tuple(row))
            out = np.vstack([out, row[None, :]])
        i = 0
        while len(out) < k and len(pvecs):  # truly fewer distinct: duplicate
            out = np.vstack([out, pvecs[i % len(pvecs)][None, :]])
            i += 1
    return out


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
    cost of k-1 extra passes; ``init="parallel"`` runs the deterministic
    k-means|| seeding (:func:`parallel_seed` — ~10 passes at any k, the
    scale path for large k). Coordinates rounded to
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
    if init not in ("lowest_id", "plusplus", "parallel"):
        raise ValueError(f"kmeans: unknown init {init!r}")
    src = df.select(id_col, vec_col)
    if cache:
        src = src.persist()
    try:
        if init == "plusplus":
            cents = _plusplus_seed(src, k, id_col, vec_col, round_digits)
        elif init == "parallel":
            cents = [
                [round(float(x), round_digits) for x in row]
                for row in parallel_seed(
                    src, k, id_col, vec_col, metric="sq_euclidean"
                )
            ]
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
            # Per-dimension means via posexplode + groupBy(cluster, pos)
            # rather than `dim` separate avg(vec[i]) agg columns: the
            # values (and their rounding) are identical — avg over the
            # same per-(cluster, dimension) multiset either way — but the
            # Catalyst tree is ~dim× smaller, which removed a measured
            # ~0.65 s of driver analysis/optimization PER LLOYD ROUND at
            # dim=64 (the 64 agg expressions each inlined the array-cast
            # subtree). Shuffle volume is unchanged: map-side partial
            # aggregation emits k·dim cells per partition, exactly what
            # the k rows × dim columns shape emitted.
            stats = (
                assigned.select(
                    "cluster", F.posexplode(vec).alias("pos", "x")
                )
                .groupBy("cluster", "pos")
                .agg(F.round(F.avg("x"), round_digits).alias("m"))
                .collect()
            )
            new = [list(c) for c in cents]  # empty clusters keep their centroid
            for row in stats:
                new[row["cluster"]][row["pos"]] = float(row["m"])
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
