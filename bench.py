"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Row-heavy queries are forced through the noop sink (full compute, no
driver materialization); small agg outputs are collected.

``--compare PREV.json`` (e.g. BENCH_r01.json) additionally prints a
per-query delta report to stderr and exits 1 if any query regressed
more than ``--threshold`` (default 1.3x) — the round-over-round
regression gate.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family, weighted toward shuffle/join/
# text-heavy paths that dominate at scale
HEADLINE = [
    "pricing_summary",
    "agg_matrix",
    "median_quantile",
    "groupby_multi",
    "groupby_datetime",
    "groupby_transform",
    "resample_6h",
    "filter_chain",
    "arithmetic",
    "sort_topk",
    "join_orders_customer",
    "join_multi_hop",
    "top_orders",
    "semi_join",
    "asof_join",
    "window_topk_per_group",
    "global_rank_topk",
    "series_rank",
    "events_tumbling",
    "events_sliding",
    "sessionize",
    "dedup_exact",
    "text_stats",
    "text_quality",
    "text_repetition",
    "fingerprint",
    "minhash_near_dup",
    "tfidf_topk",
    "es_query_dsl",
    "query_string",
    "redact_pii",
    "train_val_split",
    "cut_buckets",
    "hll_distinct",
    "ann_bruteforce",
    "knn_join",
    "embedding_norms",
    "decontaminate",
    "perplexity",
    "boilerplate",
    "curation_pipeline",
    "ppl_buckets",
    "cap_per_domain",
    "token_budget_sample",
    "skew_kurt",
    "groupby_ewm",
    "semantic_dedup",
    "url_curation",
    "frame_order_ops",
    "interpolate_gaps",
    "chunk_tokens",
    "embedding_covariance",
    "standardized",
    "cross_near_dup",
    "freq_tokens",
    "interval_overlap",
    "ann_pq",
    "dup_spans",
    "bloom_membership",
    "wordpiece",
    "bpe_train",
    "segment_dedup",
    "gopher_quality",
    "c4_rules",
    "dsir_select",
    "zorder_cluster",
    "shard_by_budget",
    "allocate_budget",
    # (ngram_jaccard is deliberately NOT a headline: its md5-portable
    # hashing is the oracle-parity path — ~6x the xxhash64 fast path
    # that minhash_near_dup already times here)
    "gapfill_locf",
    "cms_freq",
    "es_knn",
    # r4 batch: one-pass constraint suite, iterative graph centrality,
    # LSH-candidates + Levenshtein verify, trailing-window anomaly
    # scores, and the single-shuffle funnel fold
    "quality_suite",
    "pagerank",
    "editdist_near_dup",
    "rolling_zscore",
    "funnel",
    # bin-count drift and the rank-sum AUC — the two genuinely new
    # plan shapes of the later r4 batch (the keyed-window timeseries
    # ops share rolling_zscore's already-benched shape)
    "drift_psi",
    "eval_auc",
    # r5 batch: the bounded-state chained-min funnel (k aggs + joins vs
    # the fold's one shuffle) and the label-join/as-of reindex pair
    # (align shares reindex's key-join shape)
    "funnel_skew_safe",
    "reindex_ffill",
    # the Arrow-batched rolling().apply escape hatch (pandas-in-bucket)
    "rolling_apply",
    # BM25 ranked retrieval: scalar stats pass + TakeOrdered score pass
    "bm25_topk",
    # stored-index near-dup probe: increment broadcast, index map-only
    "incremental_near_dup",
    # multi-vector late-interaction (MaxSim): one doc agg, literal queries
    "maxsim",
    # hybrid lexical+vector retrieval fused by RRF (bounded top-k legs)
    "hybrid_search",
    # n-gram overlap fraction: broadcast benchmark set + one doc agg
    "contamination_overlap",
    # clustering quality (inertia + centroid silhouette): one cell agg
    "cluster_metrics",
    # order-insensitive content checksums: one hash agg
    "corpus_manifest",
    # two-series rolling Pearson through the bucketed padded plan
    "rolling_corr",
    # exact two-sample KS: checkpointed counts + bucket prefix-sum ECDFs
    "drift_ks",
    # per-query retrieval scorecard: one query-keyed exchange
    "rank_metrics",
    # exact Spearman: checkpointed pair counts + two midrank joins
    "spearman",
    # rank->uniform transform: distinct counts + prefix-sum + join back
    "rank_uniform",
    # windowed sample moments on the shared bucketed padded pass
    "rolling_skew_kurt",
    # exact keyed-window percentile
    "groupby_rolling_quantile",
    # running central moments: rank pass + one shared-Window exchange
    "expanding_skew_kurt",
    # one rank pass + one lag-exploded join + one k-keyed corr agg
    "acf",
    # centered-MA decomposition: bucketed MA + shift join + phase bcast
    "seasonal_decompose",
    # one full-scan builtin regr_* agg
    "linear_fit",
    # truncated-kernel weighted variance on the bucketed padded plan
    "ewm_std",
]

# queries whose result set is large -> noop sink instead of collect
ROW_HEAVY = {
    "decontaminate",
    "perplexity",
    "ppl_buckets",
    "cap_per_domain",
    "token_budget_sample",
    "boilerplate",
    "filter_chain",
    "groupby_transform",
    "series_rank",
    "redact_pii",
    "text_stats",
    "text_repetition",
    "fingerprint",
    "window_running_sum",
    "groupby_ewm",
    "frame_order_ops",
    "interpolate_gaps",
    "chunk_tokens",
    "standardized",
    "interval_overlap",
    "segment_dedup",
    "gopher_quality",
    "c4_rules",
    "rolling_apply",
    "rolling_corr",
}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(os.path.abspath(__file__)), "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    import eland_spark as es

    spark = es.get_session("eland_spark_bench")
    queries = entry.queries()

    # Warm the JVM outside timing: parquet footers plus one tiny query per
    # physical-operator class (hash agg, sort+window, shuffle join, HOF,
    # explode) so measured runs reflect steady-state codegen'd execution,
    # not first-touch JIT — the regime a long-lived cluster runs in.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.count()
    tiny = li.limit(2048).select(
        "l_orderkey", "l_quantity", F.concat_ws(" ", "l_returnflag", "l_linestatus", "l_shipdate").alias("txt")
    ).cache()
    tiny.groupBy("l_orderkey").agg(F.min("l_quantity"), F.sum("l_quantity")).count()
    w = Window.partitionBy("l_orderkey").orderBy("l_quantity")
    tiny.select(F.row_number().over(w), F.lead("l_quantity").over(w)).count()
    tiny.alias("a").join(tiny.alias("b"), "l_orderkey").count()
    tiny.select(
        F.explode(F.split("txt", r"\s+")).alias("t")
    ).groupBy("t").count().count()
    tiny.select(
        F.size(F.filter(F.split("txt", r"\s+"), lambda t: t.isin(["a"])))
    ).count()
    tiny.agg(
        F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5)))
    ).collect()
    from eland_spark.operators.percentiles import exact_percentiles

    exact_percentiles(tiny, "l_quantity", [0.5], partitions=4)
    # median_quantile re-enters its boundary scalars via createDataFrame;
    # warm that session-first path too (Py->JVM row conversion setup)
    spark.createDataFrame([(1.0,)], "x double").collect()
    tiny.unpersist()
    # one micro-pass through the minhash operator chain (shingle window,
    # wide min-agg, band self-join) — warms its generated-code paths
    from eland_spark.operators.dedup import minhash_candidate_pairs
    import eland_spark as es_mod

    docs_tiny = es_mod.read_parquet(
        spark, f"{SF_DIR}/documents.parquet", index_col="doc_id"
    )
    docs_tiny = type(docs_tiny)(
        docs_tiny.to_spark().limit(128), docs_tiny._schema
    )
    minhash_candidate_pairs(docs_tiny, "text", "doc_id", k=3, num_hashes=64,
                            bands=16).count()

    # absorb the first-query cold start (scheduler spin-up, broadcast
    # thread pool, parquet footer cache) on an untimed pass
    queries[HEADLINE[0]](spark, SF_DIR).collect()

    # Three timed runs per query, report the MIN: the steady-state number a
    # long-lived cluster sees (same rationale as the warmup block — the
    # first run can still pay Janino codegen for query-specific generated
    # classes, e.g. literal-baked vector folds, and absorbs scheduler
    # noise; min-of-N measures the plan, not the JIT). Three rather than
    # two because this VM shows bursty hypervisor steal: back-to-back
    # full passes at r4 varied 61→83→80 s with disjoint >1.3× "regression"
    # sets (even a bare semi_join hit 3×), so a 2-run min still lets one
    # noisy pair through; a third sample makes the min materially stabler.
    RUNS = 3
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if name in ROW_HEAVY:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "runs_per_query": RUNS,
                "agg": "min",
            }
        )
    )

    if "--compare" in sys.argv:
        prev_path = sys.argv[sys.argv.index("--compare") + 1]
        thr = (
            float(sys.argv[sys.argv.index("--threshold") + 1])
            if "--threshold" in sys.argv
            else 1.3
        )
        min_delta = (
            float(sys.argv[sys.argv.index("--min-delta") + 1])
            if "--min-delta" in sys.argv
            else 0.2
        )
        sys.exit(_compare(timings, prev_path, thr, min_delta))


def _compare(
    timings: dict, prev_path: str, threshold: float, min_delta: float = 0.2
) -> int:
    """Per-query regression report vs a previous bench JSON (accepts
    either the raw one-line output or the driver's BENCH_r{N}.json
    wrapper with a 'parsed' field). Returns a nonzero exit code when
    any query slowed past ``threshold``x AND by more than
    ``min_delta`` seconds — the absolute floor exists because
    sub-0.5s queries swing +-0.15s between back-to-back quiet runs
    (three r4 runs: window_topk_per_group 0.398/0.526/0.542s with an
    identical plan), so a pure ratio gate flags a different small
    query every run while a real regression on a heavy query clears
    both bars."""
    with open(prev_path) as f:
        prev = json.load(f)
    if "parsed" in prev:
        prev = prev["parsed"]
    base = prev.get("queries", {})
    regressed = []
    for name, now in sorted(timings.items()):
        then = base.get(name)
        if not then:
            print(f"  {name}: {now:.3f}s (new)", file=sys.stderr)
            continue
        ratio = now / then
        is_reg = ratio > threshold and (now - then) > min_delta
        flag = " <-- REGRESSED" if is_reg else ""
        print(
            f"  {name}: {now:.3f}s vs {then:.3f}s ({ratio:.2f}x){flag}",
            file=sys.stderr,
        )
        if is_reg:
            regressed.append(name)
    if regressed:
        print(
            f"REGRESSION: {len(regressed)} queries past {threshold}x: "
            f"{', '.join(regressed)}",
            file=sys.stderr,
        )
        return 1
    print(f"compare OK: no query past {threshold}x of {prev_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    main()
