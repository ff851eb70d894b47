"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced with a count()
(aggregate results are small; row-producing queries count rows) after a
warm-up of the input file listing.

Noise-proofing (round 7): this box is a shared VM with measured CPU steal
(BASELINE.md) — a single contended run can inflate sub-second entries 10-40x
with zero code delta. Two counters:
- every entry whose first run finishes under ``_RERUN_UNDER_SEC`` is run a
  second time and reported as the MIN of the two (first-run values are kept
  in ``bench_full.json`` under ``first_run``); the heavy lifecycle gates
  stay single-shot UNLESS the first run exceeds ``_SPIKE_FACTOR`` x the
  entry's committed ``bench_full.json`` reference, in which case it is
  rerun once as a contention spike (round 12; VERDICT r11 what's-wrong #2).
- host telemetry rides along under ``"host"``: 1/5/15-min load averages at
  start and end, CPU steal%% over the bench window (/proc/stat), and the
  gate scratch medium (disk by default; SNELDB_GATE_SCRATCH=tmpfs opt-in).

The consumer of the stdout line keeps only its last 2000 characters, so the
line must stay under that budget.  With ~100 suite entries the full map no
longer fits; the complete per-query result is always written to
``bench_full.json`` — in the system temp dir by default (so a driver run
never dirties the repo; round hygiene), or at ``$SPARK_GRAFT_BENCH_FULL``
when a quiet run's copy should be committed — and the stdout line keeps the
full-suite total while dropping per-query values in a FIXED priority order
(``_STDOUT_KEEP_PRIORITY``; round 12 — dropping by current-run value made
the omitted set shift run-to-run and manufactured phantom drops in the
round-over-round comparison) until it fits, recording how many were omitted
under ``"omitted"`` and pointing at the full file.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from sneldb_spark.session import get_spark

BENCH_QUERIES = [
    # engine command-language families
    "filter_where",
    "since_bound",
    "agg_count_by",
    "agg_multi",
    "agg_count_unique",
    "agg_per_day",
    "agg_per_hour_by",
    "agg_percentile",
    "order_limit_offset",
    "order_multi",
    "seq_followed_by",
    "seq_preceded_by",
    "seq_agg",
    "compare_daily",
    "plot_breakdown",
    # scale suite
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q21",
    "tpch_q2",
    "tpch_q20",
    "events_sessionize",
    "events_cohort_retention",
    "events_active_users",
    "events_experiment",
    "seq_chain",
    "seq_funnel_report",
    "seq_within_window",
    "streaming_window_agg",
    "streaming_dedup",
    "streaming_seq_followed_by",
    "streaming_seq_preceded_by",
    "streaming_seq_chain",
    # pipeline extensions
    "dedup_exact",
    # ngram runs BEFORE clusters: both share the inverted-index pair
    # kernel, and whichever runs first absorbs its cold (codegen-compile)
    # cost — attribute it to the standalone kernel gate, not the
    # components gate stacked on top of it.
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_minhash_clusters",
    "dedup_minhash_cross",
    "dedup_minhash_assign",
    "dedup_simhash",
    "dedup_span_removal",
    "dedup_line_boilerplate",
    "text_quality",
    "text_langid",
    "text_tokens_fingerprint",
    "text_ngram_counts",
    "text_novelty",
    "text_bpe_pairs",
    "text_bpe_encode",
    "text_unigram_encode",
    "text_lm_score",
    "text_repetition",
    "text_pii_redact",
    "decontaminate",
    "semantic_dedup",
    # r9/r10 additions: cross-corpus SemDeDup, hashed linear classifier
    # (inference + training), cluster-balanced sampling — every operator
    # family keeps a per-round perf trend line
    "semantic_dedup_cross",
    "text_fasttext_classify",
    "text_fasttext_train",
    "sampling_cluster_balanced",
    "corpus_stats",
    "text_chunk",
    "pack_sequences",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_audio",
    "sampling_split",
    "sampling_weighted",
    "sampling_dsir",
    "corpus_mix",
    "corpus_upsample",
    "sampling_leakage_safe",
    "sampling_token_budget",
    "sampling_group_cap",
    "sampling_training_shuffle",
    "corpus_curation",
    "corpus_report",
    "remember_show_agg",
    "remember_show_compare",
    "remember_show_seq",
    "remember_show_chain",
    "remember_show_seq_agg",
    "text_winnow",
    "similarity_lsh_topk",
    "similarity_topk",
    "similarity_ivf_topk",
    "similarity_ivf_indexed",
    "embedding_near_pairs",
    "embedding_quantize",
    "embedding_covariance",
    "embedding_kmeans",
    "similarity_knn_graph",
    "text_tfidf",
    "text_blocklist",
    "multimodal_dedup",
    "events_json_extract",
]


def _bench_streaming_ingest(spark, n_events: int) -> float:
    import json as _json
    import shutil
    import tempfile

    from sneldb_spark.engine import SnelDB
    from sneldb_spark.streaming.ingest import StreamingIngest

    # staged like the lifecycle gates (entry's _gate_tmpdir — disk by
    # default, SNELDB_GATE_SCRATCH=tmpfs to opt in on steal-heavy hosts)
    root = entrymod._gate_tmpdir()
    in_dir = os.path.join(root, "incoming")
    os.makedirs(in_dir)
    try:
        db = SnelDB(spark, os.path.join(root, "db"))
        db.store.registry.define("clicks", {"url": "string", "ms": "int"})
        per_file = 10_000
        for fi in range(n_events // per_file):
            with open(os.path.join(in_dir, f"batch{fi}.jsonl"), "w") as f:
                for i in range(per_file):
                    f.write(_json.dumps({
                        "event_type": "clicks",
                        "context_id": f"u{i % 997}",
                        "payload": _json.dumps({"url": f"/p{i}", "ms": i}),
                    }) + "\n")
        ing = StreamingIngest(db.store)
        t0 = time.perf_counter()
        ing.start_from_json_dir(in_dir)
        ing.flush()
        dt = time.perf_counter() - t0
        ing.stop()
        assert db.store.read("clicks").count() == n_events
        return dt
    finally:
        shutil.rmtree(root, ignore_errors=True)


# Entries faster than this get one rerun; the reported value is the min of
# the two runs. Heavy entries (full engine lifecycles) stay single-shot —
# UNLESS the first run blows past the committed reference (see
# _SPIKE_FACTOR): round 11 proved that a single contended first run >= 5 s
# is kept single-shot exactly when a rerun is most needed (text_bpe_pairs
# printed 43.4 s against a 0.5 s quiet number because best-of-2 never fired).
_RERUN_UNDER_SEC = 5.0

# A first run slower than max(_RERUN_UNDER_SEC, _SPIKE_FACTOR x its committed
# bench_full.json reference) is treated as a contention spike and rerun once;
# the reported value is the min and the first-run number is kept in
# bench_full.json under "first_run". In a quiet window this never fires.
_SPIKE_FACTOR = 2.0


def _reference_timings() -> dict[str, float]:
    """Per-query reference seconds from the committed bench_full.json (repo
    root), used only to detect first-run contention spikes. Missing or
    unreadable reference disables spike detection (never the bench)."""
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    try:
        with open(ref_path) as f:
            data = json.load(f)
        return {
            k: float(v)
            for k, v in data.get("queries", {}).items()
            if isinstance(v, (int, float)) and v == v
        }
    except (OSError, ValueError, KeyError):
        return {}


def _cpu_times() -> tuple[int, int] | None:
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat row."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return sum(vals), steal
    except (OSError, ValueError, IndexError):
        return None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="sneldb-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up: file listing + parquet footers + JVM codegen paths, so the
    # first timed query doesn't absorb session startup.
    for t in ("events", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    # ... and the Arrow Python-worker pool (one worker per core spawns on
    # the first mapInPandas; they are reused by every later Pandas-UDF stage).
    import pandas as _pd

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()
    # grouped-map (applyInPandas) takes a different serializer path than
    # mapInPandas; warm it too so blocked near-pairs / clusters don't absorb it
    from pyspark.sql import functions as F

    spark.range(0, 64).groupBy(F.pmod("id", F.lit(8)).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]], schema="id long"
    ).count()
    # localCheckpoint + broadcast machinery (clusters loop / TPC-H dims)
    spark.range(0, 1000).localCheckpoint(eager=True).count()
    spark.range(0, 1000).join(F.broadcast(spark.range(0, 10)), "id").count()

    scratch_label, _ = entrymod._gate_scratch_medium()
    print(f"bench scratch medium: {scratch_label}", file=sys.stderr)
    load_start = os.getloadavg()
    cpu_start = _cpu_times()
    bench_t0 = time.perf_counter()

    qs = entrymod.queries()
    reference = _reference_timings()
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:
            print(f"bench {name} FAILED: {e}", file=sys.stderr)
            timings[name] = float("nan")
            continue
        dt = time.perf_counter() - t0
        first_run[name] = round(dt, 3)
        ref = reference.get(name)
        spike = ref is not None and dt > max(_RERUN_UNDER_SEC, _SPIKE_FACTOR * ref)
        if dt < _RERUN_UNDER_SEC or spike:
            # best-of-2: a contended scheduler slice shows up as a one-run
            # spike; the min of two runs is the code's number. Heavy entries
            # are single-shot unless the first run reads as a spike against
            # the committed reference.
            if spike:
                print(
                    f"bench {name}: first run {dt:.3f}s > "
                    f"{_SPIKE_FACTOR:g}x reference {ref:.3f}s, rerunning",
                    file=sys.stderr,
                )
            t1 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
                dt = min(dt, time.perf_counter() - t1)
            except Exception as e:  # keep the first run's result
                print(f"bench {name} rerun FAILED: {e}", file=sys.stderr)
        timings[name] = round(dt, 3)
        print(f"bench {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # streaming ingest throughput: 50k JSON-lines events through the
    # Structured Streaming path into partitioned Parquet (same spike-rerun
    # rule as the query entries; each invocation stages its own tmpdir)
    ing_dt = _bench_streaming_ingest(spark, 50_000)
    first_run["streaming_ingest_50k"] = round(ing_dt, 3)
    ing_ref = reference.get("streaming_ingest_50k")
    if ing_ref is not None and ing_dt > max(_RERUN_UNDER_SEC, _SPIKE_FACTOR * ing_ref):
        print(
            f"bench streaming_ingest_50k: first run {ing_dt:.3f}s > "
            f"{_SPIKE_FACTOR:g}x reference {ing_ref:.3f}s, rerunning",
            file=sys.stderr,
        )
        ing_dt = min(ing_dt, _bench_streaming_ingest(spark, 50_000))
    timings["streaming_ingest_50k"] = round(ing_dt, 3)
    print(f"bench streaming_ingest_50k: {timings['streaming_ingest_50k']}s", file=sys.stderr)

    load_end = os.getloadavg()
    cpu_end = _cpu_times()
    host: dict = {
        "scratch": scratch_label,
        "load_start": [round(x, 2) for x in load_start],
        "load_end": [round(x, 2) for x in load_end],
        "bench_wall_sec": round(time.perf_counter() - bench_t0, 1),
    }
    if cpu_start and cpu_end and cpu_end[0] > cpu_start[0]:
        host["steal_pct"] = round(
            100.0 * (cpu_end[1] - cpu_start[1]) / (cpu_end[0] - cpu_start[0]), 2
        )
    print(f"bench host telemetry: {host}", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "total wall seconds over headline query suite",
        "value": round(sum(v for v in timings.values() if v == v), 3),
        "unit": "sec",
        # a failed query is null, not NaN: strict JSON parsers reject NaN
        "queries": {k: (v if v == v else None) for k, v in timings.items()},
        "sf": sf_val,
        "host": host,
    }
    # round hygiene (VERDICT r10 #4): the driver's per-round run used to
    # overwrite the committed bench_full.json and leave the tree dirty at
    # round close. Default the full dump to an UNTRACKED path; a quiet
    # benchmark run that should be committed sets SPARK_GRAFT_BENCH_FULL
    # to the repo copy explicitly.
    full_path = os.environ.get("SPARK_GRAFT_BENCH_FULL") or os.path.join(
        tempfile.gettempdir(), "bench_full.json"
    )
    with open(full_path, "w") as f:
        json.dump({**result, "first_run": first_run}, f, indent=1, sort_keys=True)
        f.write("\n")
    print(_fit_stdout_line(result), flush=True)


# stdout budget: the consumer keeps the last 2000 chars of output; leave
# headroom for a trailing newline and any stray log line.
_STDOUT_BUDGET = 1900

# Which entries stay visible when the one-line JSON must shed entries to fit
# the consumer's tail window. Round 11 dropped the smallest CURRENT-RUN
# timings, which made the omitted set shift run-to-run and manufactured
# phantom "dropped_from_bench" rows in the round-over-round comparison
# (VERDICT r11 what's-wrong #1). The priority is now FIXED: first every name
# that was visible in the round-11 driver stdout (so the driver's trend lines
# never lose an entry), then the remaining suite in descending committed
# reference time (biggest signal kept first). Trimming drops from the END of
# this list; failed queries (null) are never dropped.
_STDOUT_KEEP_PRIORITY = [
    # round-11 driver-visible set (BENCH_r11.json stdout order)
    "seq_followed_by", "seq_preceded_by", "seq_agg", "compare_daily",
    "plot_breakdown", "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q10",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q21",
    "tpch_q2", "tpch_q20", "events_experiment", "seq_chain",
    "seq_funnel_report", "seq_within_window", "streaming_window_agg",
    "streaming_dedup", "streaming_seq_followed_by",
    "streaming_seq_preceded_by", "streaming_seq_chain", "dedup_ngram_jaccard",
    "dedup_clusters", "dedup_keep_best", "dedup_minhash_lsh",
    "dedup_minhash_clusters", "dedup_minhash_cross", "dedup_minhash_assign",
    "dedup_simhash", "dedup_span_removal", "dedup_line_boilerplate",
    "text_bpe_pairs", "text_bpe_encode", "text_unigram_encode",
    "decontaminate", "semantic_dedup", "semantic_dedup_cross",
    "text_fasttext_classify", "text_fasttext_train",
    "sampling_cluster_balanced", "multimodal_features", "multimodal_resize",
    "sampling_dsir", "corpus_upsample", "corpus_curation",
    "remember_show_agg", "remember_show_compare", "remember_show_seq",
    "remember_show_chain", "remember_show_seq_agg", "similarity_lsh_topk",
    "similarity_ivf_topk", "similarity_ivf_indexed", "embedding_covariance",
    "embedding_kmeans", "similarity_knn_graph", "text_tfidf",
    "streaming_ingest_50k",
    # rest of the suite, descending committed reference time (r11 close run)
    "similarity_topk", "embedding_near_pairs", "tpch_q15", "text_winnow",
    "filter_where", "agg_multi", "text_ngram_counts", "events_sessionize",
    "agg_count_by", "events_cohort_retention", "agg_per_hour_by",
    "agg_count_unique", "events_active_users", "agg_percentile",
    "agg_per_day", "since_bound", "tpch_q22", "text_repetition",
    "order_multi", "text_langid", "text_novelty", "sampling_leakage_safe",
    "order_limit_offset", "text_chunk", "corpus_report",
    "sampling_token_budget", "text_quality", "sampling_group_cap",
    "text_lm_score", "multimodal_audio", "corpus_mix", "tpch_q6",
    "pack_sequences", "dedup_exact", "text_blocklist", "sampling_weighted",
    "text_pii_redact", "corpus_stats", "multimodal_dedup",
    "embedding_quantize", "events_json_extract", "sampling_training_shuffle",
    "text_tokens_fingerprint", "sampling_split",
]


def _fit_stdout_line(result: dict) -> str:
    """Compact-encode `result`, dropping per-query timings in FIXED reverse
    priority order (deterministic run-to-run; failed queries — null — are
    never dropped) until the line fits the consumer's 2000-char tail window.
    `value` stays the full-suite total regardless of omissions."""
    out = dict(result)
    out["metric"] = "suite wall sec"  # shorter; full string lives in bench_full.json
    queries = dict(result["queries"])
    line = json.dumps(out, separators=(",", ":"))
    if len(line) <= _STDOUT_BUDGET:
        return line
    # 2-decimal stdout values buy ~70 chars of headroom so the keep-priority
    # prefix fits even when several entries read in the tens of seconds;
    # 3-decimal precision is preserved in bench_full.json.
    queries = {
        k: (round(v, 2) if isinstance(v, float) else v) for k, v in queries.items()
    }
    out["queries"] = queries
    line = json.dumps(out, separators=(",", ":"))
    if len(line) <= _STDOUT_BUDGET:
        return line
    prio = {name: i for i, name in enumerate(_STDOUT_KEEP_PRIORITY)}
    # drop order: names absent from the priority list first (smallest value
    # first among them — they carry the least signal), then listed names in
    # reverse priority; failures (null) are excluded — never dropped
    def _drop_key(k):
        if k in prio:
            return (1, -prio[k])
        return (0, queries[k])

    order = sorted((k for k in queries if queries[k] is not None), key=_drop_key)
    omitted = 0
    for name in order:
        del queries[name]
        omitted += 1
        out["queries"] = queries
        out["omitted"] = omitted
        out["full"] = "bench_full.json"
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= _STDOUT_BUDGET:
            return line
    # last resort (mass failure): an over-budget line is unparseable once the
    # consumer trims its tail window, so shed failures too, lowest priority
    # first — a short parseable line beats a long truncated one.
    for name in sorted(queries, key=lambda k: (1, -prio[k]) if k in prio else (0, 0)):
        del queries[name]
        omitted += 1
        out["queries"] = queries
        out["omitted"] = omitted
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= _STDOUT_BUDGET:
            return line
    return line


if __name__ == "__main__":
    main()
