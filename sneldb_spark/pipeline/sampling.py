"""Deterministic sampling / dataset splits for training pipelines.

Random `df.sample` is not reproducible across runs, partitionings, or
engines — a training pipeline needs the SAME example landing in the SAME
split on every machine forever. These operators derive the decision from a
content hash of a stable id (md5 → first 8 hex chars → bucket), so:

- assignment is a pure per-row function: no shuffle, no seed state,
  engine-portable (any SQL engine reproduces it — see the md5-based
  oracles in __spark_entry__.py);
- new data joins existing splits consistently (no re-shuffling of old
  examples when the corpus grows);
- at 100 TB it is a narrow codegen'd map over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets): first 32 bits of md5 of the value."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return h % buckets


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Add a split label ('train'/'val'/'test' by default) chosen by the
    id's hash bucket; fractions must sum to <= 1 (remainder -> last split)."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    if not splits or sum(splits.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions must sum to at most 1")
    bucket = hash_bucket(F.col(id_col))
    expr = None
    edge = 0
    names = list(splits)
    for name in names[:-1]:
        edge += int(round(splits[name] * BUCKETS))
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | float,
    strata_col: str | None = None,
) -> DataFrame:
    """Keep a deterministic fraction of rows — uniformly, or per stratum
    when `fractions` is a {stratum: fraction} dict (absent strata keep 0)."""
    bucket = hash_bucket(F.col(id_col))
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions require strata_col")
        thresh = None
        for value, frac in fractions.items():
            cond = F.col(strata_col) == F.lit(value)
            t = F.lit(int(round(frac * BUCKETS)))
            thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
        thresh = thresh.otherwise(F.lit(0))
    else:
        thresh = F.lit(int(round(fractions * BUCKETS)))
    return df.where(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
) -> DataFrame:
    """Keep each row with probability equal to its per-row weight in
    [0, 1] — deterministically: the row's hash bucket is compared against
    its own weight-scaled threshold, so the same row survives (or not) on
    every engine and partitioning forever. The quality-weighted corpus
    downsample ("keep high-quality docs, thin the rest") is this operator
    with weight = quality score. Pure per-row codegen, no shuffle."""
    bucket = hash_bucket(F.col(id_col))
    thresh = F.round(F.col(weight_col) * BUCKETS).cast("long")
    return df.where(bucket < thresh)


def mix_corpus(
    df: DataFrame,
    id_col: str,
    source_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Deterministically downsample to target SOURCE PROPORTIONS — the
    data-mixing step before a training run ("50% web, 30% code, 20%
    books"). The largest feasible mixed corpus is taken: total T =
    min_s(available_s / frac_s); each source keeps floor-thresholded
    frac_s*T of its rows by content-hash bucket, so the output hits the
    target ratios (up to bucket granularity) without replacement,
    reproducibly across engines and corpus growth.

    One count aggregate (driver gets |targets| scalars) + one codegen'd
    filter pass — no shuffle of the data itself. Sources absent from
    `targets` are dropped."""
    fracs = {s: f for s, f in targets.items() if f > 0}
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[source_col] in fracs
    }
    if not counts:
        return df.where(F.lit(False))
    total = min(counts[s] / f for s, f in fracs.items() if s in counts)
    bucket = hash_bucket(F.col(id_col))
    thresh = None
    for s, f in fracs.items():
        if s not in counts:
            continue
        keep = min(1.0, f * total / counts[s])
        t = F.lit(int(keep * BUCKETS))  # floor: half-case-free across engines
        cond = F.col(source_col) == F.lit(s)
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(F.lit(0))
    return df.where(bucket < thresh)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    splits: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment where every EXACT duplicate of a document
    lands in the same split — the split decision hashes the duplicate
    group's representative (min id per content digest), not the row id.
    Plain id-hash splitting leaks: two copies of one document can straddle
    train and test, inflating eval. One digest shuffle for the group
    representative, joined back co-partitioned on the same key; the
    near-dup-safe variant is the same composition with `dedup_clusters`
    cluster ids as the digest."""
    digest = F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    keyed = df.withColumn("__digest", digest)
    reps = keyed.groupBy("__digest").agg(F.min(F.col(id_col)).alias("__rep"))
    out = keyed.join(reps, "__digest")
    out = deterministic_split(out, "__rep", splits, split_col)
    return out.drop("__digest", "__rep")


def token_budget_sample(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    source_col: str | None = None,
) -> DataFrame:
    """Deterministically fill a token budget: documents are taken in
    md5(id) order (a stable pseudo-random permutation — no RNG state,
    engine-portable) until the running token total would exceed `budget`;
    the first document that crosses the budget, and everything after it,
    is dropped. With `source_col`, each source fills its own `budget`
    independently (the per-source quota form used when mixing corpora to
    a target token count).

    Scale: one shuffle — the cumulative sum is a running-frame window
    partitioned by source (or a single partition without `source_col`,
    which is the op's inherent sequential dependency; at 100 TB you
    always pass `source_col`, and a global budget is taken per-source
    with budget_i = budget * mix_weight_i). The window frame is
    rows-unbounded-preceding over an md5 sort — no collect, no loop.
    """
    from pyspark.sql.window import Window

    order = [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()]
    w = (
        Window.partitionBy(F.col(source_col)) if source_col else Window.partitionBy()
    ).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("__cum_tokens", F.sum(F.col(token_col)).over(w))
        .where(F.col("__cum_tokens") <= budget)
        .drop("__cum_tokens")
    )


def upsample_corpus(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Deterministic UPSAMPLING to integer target weights — the data-mixing
    step when the high-quality sources are the SMALL ones ("weight books
    3x against web"), so rows replicate instead of dropping. The smallest
    corpus hitting the exact ratios is taken: with W = sum(weights),
    scale = max_s ceil(count_s * W / w_s) total rows, each source emits
    n_s = w_s * scale // W rows as floor(n_s/count_s) full copies plus a
    bucket-thresholded extra copy (same md5-bucket granularity contract
    as mix_corpus). All arithmetic is INTEGER, so any engine reproduces
    the replication factors bit-for-bit — no float-threshold fragility.

    One count aggregate (|weights| scalars to the driver) + a broadcast
    of the |sources|-row replication table + one codegen explode — the
    corpus itself never shuffles. Output: input columns + `copy`
    (0-based replica index). Sources absent from `weights` are dropped.
    """
    ws = {s: int(w) for s, w in weights.items() if int(w) > 0}
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[source_col] in ws
    }
    if not counts:
        return df.where(F.lit(False)).withColumn("copy", F.lit(0).cast("long"))
    w_total = sum(ws.values())
    scale = max((counts[s] * w_total + ws[s] - 1) // ws[s] for s in counts)
    spark = df.sparkSession
    plan = []
    for s in counts:
        n_s = ws[s] * scale // w_total
        copies, rem = divmod(n_s, counts[s])
        thr = rem * BUCKETS // counts[s]
        plan.append((s, copies, thr))
    rep = F.broadcast(
        spark.createDataFrame(plan, f"{source_col} string, __copies long, __thr long")
    )
    bucket = hash_bucket(F.col(id_col))
    n_col = F.col("__copies") + F.when(bucket < F.col("__thr"), 1).otherwise(0)
    return (
        df.join(rep, source_col)
        .select(
            *df.columns,
            F.explode(
                F.when(n_col > 0, F.sequence(F.lit(0).cast("long"), n_col - 1))
                .otherwise(F.array().cast("array<long>"))
            ).alias("copy"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain / per-source document cap — the crawl-curation step
    that stops a handful of giant domains from dominating the corpus.

    Keeps at most `cap` documents per group, chosen deterministically in
    md5(id) order (id as the tiebreak), so the decision is
    engine-portable and independent of partitioning. Note the kept SET
    can change as a group grows past the cap (an inherent property of
    any exact cap — rank is relative); use `weighted_sample` when
    per-row stability under growth matters more than an exact ceiling.

    One window shuffle on the group key; at 100 TB group skew is the
    planning concern (a mega-domain serializes its partition) — AQE skew
    handling applies because the window input is a plain hash exchange.

    Output: input columns + `group_rank` (1-based within the group),
    filtered to the kept rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("group_rank", F.row_number().over(w))
        .where(F.col("group_rank") <= cap)
    )


def training_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row
    gets a (shard, pos) address that is a pure function of (id, seed) —
    the same example lands at the same place on every machine, engine,
    and partitioning, and changing `seed` produces an independent
    permutation (epoch reshuffling without RNG state).

    shard = first 32 bits of md5(id ':' seed) mod n_shards; pos = the
    row's 0-based rank within its shard by the full md5 digest (id as
    the tiebreak). Readers stream shard files in pos order and get a
    uniform random interleave of the corpus.

    Scale shape: one hash-partitioned window shuffle; each shard is one
    sort partition, so pick n_shards to the target shard FILE size
    (~256 MB-1 GB each — at 100 TB that is 100k-400k shards, far past
    any skew concern since md5 spreads uniformly). The address is stable
    under append only within a shard's existing ranks shifting; for
    strict epoch reproducibility, pin the corpus snapshot first
    (REMEMBER or a parquet export).

    Output: input columns + `shard` (int) + `pos` (0-based long).
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__key").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .drop("__key")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 32,
    mode: str = "error",
) -> None:
    """Materialize the `training_shuffle` permutation as shard
    directories: `path/shard=<k>/` each holding ONE file whose row order
    is the shard's `pos` order — a training reader streams the files
    as-is and sees the deterministic global interleave, no sort at read
    time.

    One hash repartition on the shard id (so each shard is written by
    exactly one task, giving one file per shard) + an in-task sort on
    (shard, pos). Same 100 TB sizing rule as training_shuffle: pick
    n_shards for ~256 MB-1 GB files.
    """
    addressed = training_shuffle(df, id_col=id_col, seed=seed, n_shards=n_shards)
    (
        addressed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def _grams(text_col: str) -> Column:
    """Array of unigrams + space-joined adjacent bigrams over the \\W+
    split of the lowercased text — DSIR's hashed feature domain."""
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
    )
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, 1, n1), F.slice(ws, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(ws, bigrams)


def _hashed_gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int,
) -> DataFrame:
    """(id, b): one row per unigram+bigram occurrence, hashed to a stable
    bucket in [0, num_buckets). The bucket is the house content hash
    (md5 -> first 8 hex -> mod), so any SQL engine reproduces the
    featurization exactly."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(_grams(text_col)).alias("gram"),
    ).select("id", hash_bucket(F.col("gram"), num_buckets).alias("b"))


def dsir_target_profile(
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = BUCKETS,
) -> DataFrame:
    """(b, cp): the target corpus's hashed-gram bucket histogram — at
    most `num_buckets` rows. Persist it once (one small parquet) and
    pass it to dsir_weights/dsir_resample as `target_profile` to score
    every future crawl WITHOUT rescanning the target corpus — the same
    incremental pattern as minhash_cross_pairs' reference signatures.
    The profile must be built with the same `num_buckets` it is later
    scored with."""
    return (
        target.select(F.explode(_grams(text_col)).alias("gram"))
        .select(hash_bucket(F.col("gram"), num_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cp"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = BUCKETS,
    add_k: float = 1.0,
    target_profile: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw
    document by how much more likely its hashed n-gram features are under
    the TARGET distribution than under the RAW distribution.

    Features are bag-of-hashed unigrams+bigrams over `num_buckets`
    buckets (the paper's 10k default); both corpus distributions get
    add-k smoothing over the full bucket space, so target-unseen buckets
    contribute the smoothed floor rather than -inf. Per document,
    logw = sum_g [ln p_target(b(g)) - ln p_raw(b(g))] over its gram
    occurrences, rounded to 4 decimals (engine-portable, same convention
    as lm_quality_score).

    Scale shape: ONE pass over raw (a grouping-sets aggregate emits the
    per-doc bucket counts and the corpus bucket histogram together,
    materialized via localCheckpoint and read back by both consumers)
    and one over target, each map-side combined. The log-ratio table is
    <= num_buckets rows, so the per-doc scoring join broadcasts under
    any sane threshold (no hint forced — AQE handles it). Nothing is
    ever all-pairs and no driver collect occurs; at 100 TB this is two
    linear scans plus a per-(doc, bucket)-sized local materialization
    (the same bytes the old second pass shuffled). Scoring crawls repeatedly against one fixed
    target? Build `dsir_target_profile` once and pass it as
    `target_profile` (instead of `target`) — the target scan drops out.

    Output: (id, n_grams, dsir_logw); docs with no tokens have
    n_grams = 0 and NULL dsir_logw (excluded from resampling, same NULL
    convention as lm_quality_score).
    """
    per = _dsir_scored(
        raw, target, id_col, text_col, num_buckets, add_k, target_profile
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select("id", F.coalesce("n_grams", F.lit(0)).alias("n_grams"), "dsir_logw")
    )


def _dsir_scored(
    raw: DataFrame,
    target: DataFrame | None,
    id_col: str,
    text_col: str,
    num_buckets: int,
    add_k: float,
    target_profile: DataFrame | None = None,
) -> DataFrame:
    """(id, n_grams, dsir_logw) for every raw doc with >= 1 gram — the
    scored core shared by dsir_weights (which left-joins the raw ids
    back so token-less docs appear with NULL weight) and dsir_resample
    (which would only filter those NULLs out again, so it skips the
    extra raw scan)."""
    if add_k <= 0:
        # unsmoothed, a target-absent bucket has p=0 and ln(0) poisons
        # the doc's weight to NULL — reject rather than emit NULL keys
        raise ValueError("dsir: add_k must be > 0 (smoothing keeps ln finite)")
    if (target is None) == (target_profile is None):
        raise ValueError("dsir: pass exactly one of target / target_profile")
    gb_raw = _hashed_gram_buckets(raw, id_col, text_col, num_buckets)
    # ONE tokenize+hash pass serves both raw-side distributions: grouping
    # sets compute the per-(doc, bucket) counts and the corpus bucket
    # histogram in a single aggregation, materialized once so the
    # log-ratio table and the scoring join read it back instead of each
    # re-running the explode+md5 featurization over the corpus. gid
    # (grouping_id) separates the two sets, so a NULL id in the data can
    # never be confused with the aggregated-away marker.
    counts = (
        gb_raw.groupingSets([["b", "id"], ["b"]], "b", "id")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .localCheckpoint(eager=True)
    )
    docb = counts.where("gid = 0").select("id", "b", "n")
    qc = counts.where("gid = 1").select("b", F.col("n").alias("cq"))
    if target_profile is not None:
        pc = target_profile.select("b", "cp")
    else:
        # pc feeds both the per-bucket join and the pt total; without a
        # materialization each consumer re-tokenizes the target corpus
        # (no common-subexpression reuse across subtrees). The profile is
        # <= num_buckets rows, so checkpointing it is free.
        pc = dsir_target_profile(target, text_col, num_buckets).localCheckpoint(
            eager=True
        )
    qt = qc.agg(F.sum("cq").cast("double").alias("__qt"))
    pt = pc.agg(F.coalesce(F.sum("cp"), F.lit(0)).cast("double").alias("__pt"))
    kb = F.lit(add_k * num_buckets)
    # every bucket a raw doc references has cq >= 1, so a left join from
    # the raw side covers the full scoring domain; target-absent buckets
    # take the smoothed floor via coalesce(cp, 0)
    lr = (
        qc.join(pc, "b", "left")
        .crossJoin(qt)
        .crossJoin(pt)
        .select(
            "b",
            (
                F.log((F.coalesce("cp", F.lit(0)) + F.lit(add_k)) / (F.col("__pt") + kb))
                - F.log((F.col("cq") + F.lit(add_k)) / (F.col("__qt") + kb))
            ).alias("lr"),
        )
    )
    return (
        docb.join(lr, "b")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.round(F.sum(F.col("n") * F.col("lr")), 4).alias("dsir_logw"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame | None,
    k_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = BUCKETS,
    add_k: float = 1.0,
    target_profile: DataFrame | None = None,
) -> DataFrame:
    """DSIR's selection step: sample `k_docs` raw documents without
    replacement with probability proportional to exp(dsir_logw) — the
    Gumbel top-k trick, derandomized with the house md5 uniform so the
    SAME documents are selected on every engine and partitioning.

    key = dsir_logw + Gumbel(0,1) where the Gumbel variate is
    -ln(-ln(u)) and u = md5("<id>:gumbel") first-15-hex / 16^15, clamped
    to (0,1) open. Selection is the top `k_docs` by (key desc, id asc) —
    one TakeOrdered pass, no global sort. Token-less docs never qualify
    (the scored core only emits docs with >= 1 gram).

    Output: (id, n_grams, dsir_logw, dsir_key), the selected rows only.
    """
    per = _dsir_scored(
        raw, target, id_col, text_col, num_buckets, add_k, target_profile
    )
    u_raw = F.conv(
        F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(":gumbel"))), 1, 15),
        16, 10,
    ).cast("double") / F.lit(float(16 ** 15))
    u = F.greatest(F.least(u_raw, F.lit(1.0 - 1e-12)), F.lit(1e-12))
    keyed = per.select(
        "id", "n_grams", "dsir_logw",
        F.round(F.col("dsir_logw") + (-F.log(-F.log(u))), 4).alias("dsir_key"),
    )
    return keyed.orderBy(F.col("dsir_key").desc(), F.col("id").asc()).limit(k_docs)


def cluster_balanced_sample(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    cap: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Cluster-balanced selection over an embedding corpus: Lloyd
    k-means partitions the embedding space (deterministic lowest-id
    seeding — see clustering.kmeans), then an exact per-cluster cap
    keeps at most `cap` vectors per cluster in md5(id) order — the
    embedding-space analogue of per-domain capping (cf. cluster-
    balanced data selection in DCLM/SemDeDup-style curation: sample
    evenly across semantic regions instead of letting one dense mode
    dominate the training mix).

    Pure composition of two shipped kernels: kmeans (codegen
    literal-centroid assignment, k·(d+1)-cell map-side-combined
    updates) and cap_per_group (one window shuffle on the cluster key).
    Output: (id, cluster, group_rank) for the kept rows.
    """
    from sneldb_spark.pipeline.clustering import kmeans

    assigned, _ = kmeans(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )
    return cap_per_group(
        assigned.select(id_col, "cluster"),
        group_col="cluster", cap=cap, id_col=id_col,
    ).select(
        id_col,
        F.col("cluster").cast("int").alias("cluster"),
        F.col("group_rank").cast("int").alias("group_rank"),
    )
