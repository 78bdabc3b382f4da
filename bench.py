"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <float>,
   "n_queries": N, "queries_omitted": M}

The stdout ``queries`` map is CAPPED, most-expensive-first, so the
rendered line stays under ``STDOUT_LINE_BUDGET`` chars: the driver
captures a merged-stream 2000-char TAIL and parses its last line, and
at 60 headline queries the full map overflowed that capture, cutting
off the head of the line (BENCH_r08.json ``parsed: null`` — the third
last-line parsing incident after r6's log interleave and r7's spread
move). The COMPLETE per-query min/median/max map always lives in the
sibling ``bench_spread.json``; stdout carries the headline total plus
as many of the slowest queries as fit (``stdout_payload`` below,
pinned by tests/test_bench_stdout.py).

Execution sink is the noop writer so timings measure plan execution,
not driver-side row transfer.

$SPARK_GRAFT_BENCH_RUNS (default 5) full passes are run and the
PER-QUERY MEDIAN reported — single runs showed GC/ordering variance
up to 2x on individual entries (SCALE.md "bench variance"); the
median makes round-over-round regressions attributable. Set it to 1
for quick local iteration.

Noise protocol (VERDICT r5 #3): passes are RUN-MAJOR interleaved —
pass 1 times every query, then pass 2, ... — so one query's samples
are separated by a full pass (~50 s of unrelated work) and a
transient machine-state episode (GC debt, co-tenant CPU burst)
lands in at most one sample per query instead of all of them; each
timing is additionally isolated by clearCache + py/JVM GC. The
default was raised 3 -> 5 passes: with contention noise, a
median-of-3 flips to the noisy side whenever 2 of 3 samples are hit
(one episode spanning two adjacent passes suffices); median-of-5
needs 3 hit samples. Per-query min/median/max across passes is
written to ``bench_spread.json`` next to this file — the spread is
the variance band SCALE.md records, and a mover whose
round-over-round delta sits inside its own band is noise, not a
regression. (It went to stderr in r6, but the driver captures
stdout+stderr MERGED and parses the LAST line of a 2000-char tail;
the stderr line landed after the stdout line and broke the parse —
BENCH_r06.json has ``parsed: null``. A file can't race the stdout
contract.)
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

from tfm_semisup_spark.queries import QUERIES, load_all_queries
from tfm_semisup_spark.session import get_spark

# Headline set: one per operator family (join+agg, wide agg, window fns,
# event-time windows, as-of/range joins, rollup, grouped-pandas, dedup
# exact->LSH, similarity, text, ML pipeline, multimodal plumbing).
HEADLINE = [
    "flagship_regional_revenue",
    "pricing_summary",
    "window_rank_top_order",
    "tumbling_window_hourly",
    "session_window_30m",
    "asof_join_latest_order",
    "range_join_event_pairs",
    "daily_rollup_by_type",
    "grouped_pandas_value_trend",
    "dedup_exact_stats",
    "dedup_ngram_jaccard_pairs",
    "dedup_cluster_components",
    # MinHash headline tier = the pure-columnar banded variant: emits
    # the IDENTICAL verified pair set as the MLlib approxSimilarityJoin
    # tier (equality-asserted at sf0.01/0.1 in tests/test_dedup_skew.py)
    # at ~2x the speed (r2 bench: 5.4s vs 11.5s). The MLlib path stays
    # registered as a cross-check query but is no longer benched.
    "dedup_minhash_banded_pairs",
    "dedup_simhash_pairs",
    # r5: the fully-oracled portable minhash tier (md5-slice
    # signatures) — visibility for the cross-engine dedup math path
    "dedup_minhash_portable_pairs",
    "similarity_cosine_topk",
    # r4: ANN tier visibility (VERDICT r3 #7) — a regression in the PQ
    # encode/ADC scan or the composed IVF-PQ probe path was previously
    # invisible to the bench; recall is covered by tests, latency here.
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "text_stats_by_lang",
    "quality_rule_report",
    "pii_redaction_report",
    "contamination_screen",
    "domain_mix_sample",
    "multimodal_feature_stub",
    "ssl_selftrain_threshold",
    # r3 families: semantic (embedding-space) dedup, deterministic
    # training-shard shuffle, resize/thumbnail plumbing
    "dedup_semantic_semdedup",
    "training_shard_assignment",
    "multimodal_resize_stub",
    # r4 families: the deepest join tree in the suite (6-way snowflake),
    # lexical BM25 retrieval, and the Levenshtein-verified dedup tier
    "q5_local_supplier_volume",
    "text_bm25_topk",
    # r5: the workload shape — batch scoring against precomputed
    # index stats (build_bm25_stats)
    "text_bm25_workload_topk",
    "dedup_editdist_pairs",
    # r4 behavioral analytics: sequence-dependent conversion (user-keyed
    # range join) and the per-order distinct-count Q21 formulation
    "funnel_view_purchase",
    "q21_waiting_suppliers",
    # late-r4 families: line-level boilerplate removal (one corpus
    # reassembly shuffle), the bloom membership screen (codegen bit
    # probe), and iterative graph propagation (5 PageRank rounds)
    "boilerplate_line_removal",
    "bloom_contamination_screen",
    "item_pagerank",
    # r6 families: oriented triangle enumeration (graph density), the
    # unigram-LM quality score (wordcount + term-keyed prob join), the
    # real Arrow decode path (encode -> numpy BMP/PPM parse), and the
    # robust MAD outlier pass (two exact medians + counting scan)
    "item_triangle_counts",
    "text_unigram_logppl",
    "multimodal_bmp_decode_stats",
    "robust_outlier_mad",
    # late-r6 families: collocation mining (full bigram aggregate over
    # the token stream — the heaviest text shuffle in the suite),
    # iterative k-core peeling (3 checkpointed semi-join rounds), the
    # embedding-space contamination probe (broadcast cosine scan), and
    # the integer-weighted EWMA contribution explode
    "text_bigram_pmi",
    "item_kcore_membership",
    "semantic_contamination_screen",
    "ewma_daily_revenue",
    # end-of-r6 families: the single-pass anti-entropy checksum and
    # the tokenize-to-ids pipeline (wordcount + broadcast id map)
    "table_fingerprint_orders",
    "vocab_id_stats",
    # r8 families: temperature source mixing (broadcast counts +
    # integer md5 threshold), the Zipf vocab-head OLS audit, the
    # 36-partial covariance slice, and the real decode+NN-resize
    # Arrow kernel
    "domain_temperature_sample",
    "zipf_token_audit",
    "embedding_covariance_slice",
    "multimodal_resize_decode_stats",
    # r8 batch-5..8 families: fixed-round graph BFS, the banded
    # Theil-Sen robust trend, the grid-blocked spatial radius join,
    # Kaplan-Meier survival, and the strided video frame-sample kernel
    "item_bfs_hop_distance",
    "theilsen_daily_revenue_slope",
    "spatial_grid_radius_pairs",
    "kaplan_meier_conversion",
    "multimodal_video_framesample_stats",
    # r8 late batches: drift gate, Spark-4 VARIANT path, basket lift,
    # and the pair-distance embedding audit
    "psi_price_by_segment",
    "variant_props_extract",
    "basket_part_lift",
    "embedding_pair_distance_histogram",
    # r9 families: the exact-integer NB promotion round (threshold
    # criterion), the heaviest multi-view variant (tri-training's
    # 3-scorer join), a bounded-grid rank statistic (Spearman), and
    # the basket-width-bounded co-order graph statistic
    "ssl_selftrain_one_round_nb",
    "ssl_tritrain_one_round_nb",
    "spearman_qty_disc",
    "part_degree_assortativity",
    # late-r9 families: the bloom semi-join reduction (runtime-filter
    # pushdown — the shuffle-volume lever) and the quantized Markov
    # power iteration
    "bloom_semijoin_volume",
    "event_markov_stationary",
    # end-of-r9 families: blocked entity-resolution scoring (the
    # Fellegi-Sunter pair join) and NEAR/k positional retrieval (the
    # workload-filtered position-pair join)
    "record_linkage_fs",
    "text_proximity_search",
    # post-close r9 families: banded hard-negative mining (broadcast
    # anchors + window-barrier band) and perplexity-band pruning (LM
    # join + counted-grid value cuts)
    "similarity_hard_negatives",
    "corpus_ppl_prune",
    # r10 families: IVF-mined hard negatives (the bounded sibling of
    # the brute tier above), the two-round self-training refit, the
    # Mann-Kendall grid-pair trend, two-iteration HITS, the MinHash
    # estimate-vs-exact calibration join, and RAKE phrase extraction
    "similarity_hard_negatives_ann",
    "ssl_selftrain_two_round_nb",
    "mann_kendall_daily_trend",
    "part_hits_authorities",
    "minhash_calibration_audit",
    "keyword_rake_top",
    # r11 family: the two-round co-training cross-teach (4 NB fits,
    # 2 kBest boundary probes per round, one pool equi-join)
    "ssl_cotrain_two_round_nb",
    # r11 continuation: survival/rank/causal inference, link
    # prediction, winnowing, DSIR selection, hybrid RRF retrieval,
    # and the two promotions' newly-oracled plans
    "logrank_conversion_ab",
    "kruskal_wallis_qty_flag",
    "did_order_value",
    "item_link_prediction_ra",
    "dedup_winnowing_pairs",
    "dsir_importance_select",
    "retrieval_rrf_hybrid",
    "bpe_train_merges",
    "rmst_conversion_ab",
    "item_community_lpa",
    "domain_mixture_plan",
    "text_collocation_g2",
    "ssl_mcnemar_feature_ablation",
    "t_closeness_audit",
    "pacf_daily_revenue",
    "ssl_tritrain_two_round_nb",
    "competing_risks_incidence",
    "bpe_fertility_by_lang",
    "dedup_cascade_report",
    "part_brand_assortativity",
    "revenue_lorenz_deciles",
    "error_pchart_daily",
    "ssl_kappa_agreement",
]


#: hard ceiling for the rendered stdout JSON line. The driver's tail
#: capture is 2000 chars of MERGED stdout+stderr; budget well under it
#: so an incidental log line sharing the tail can't push the head of
#: the JSON out of the capture again.
STDOUT_LINE_BUDGET = 1400

#: machine-calibration anchors (VERDICT r10 #2). The r10 round-over-
#: round comparison found a uniform 1.18x drift on UNCHANGED code and
#: could only attribute it to machine conditions by code-diff
#: argument — unfalsifiable from the bench output alone. These two
#: fixed-work probes make the claim checkable: their wall time depends
#: ONLY on machine state (single-core speed + memory for the hash;
#: JVM/parallel throughput for the range-agg), never on repo code, so
#:   normalized_ratio(q) = (t_q^rN / t_q^rN-1) / (calib^rN / calib^rN-1)
#: deconfounds machine drift from plan drift (rule recorded in
#: SCALE.md "bench calibration"). Probe sizes target ~0.3-0.8 s
#: (measured: sha256 ~1.6 GB/s single-core, range-agg ~1e9 rows/s on
#: local[32]): large enough that timer noise is <1%, small enough to
#: rerun 6x.
_CALIB_HASH_BYTES = 512 * 1024 * 1024  # sha256 over 512 MiB of zeros
_CALIB_RANGE_ROWS = 400_000_000  # codegen'd sum(id*id) over range()


def _calib_probe_cpu() -> float:
    import hashlib

    chunk = bytes(1024 * 1024)
    start = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(_CALIB_HASH_BYTES // len(chunk)):
        h.update(chunk)
    h.hexdigest()
    return time.perf_counter() - start


def _calib_probe_spark(spark) -> float:
    start = time.perf_counter()
    # double accumulator: id*id overflows BIGINT past ~3e9 total work
    spark.range(_CALIB_RANGE_ROWS).selectExpr(
        "sum(cast(id AS double) * cast(id AS double)) AS s"
    ).collect()
    return time.perf_counter() - start


def measure_calibration(spark, samples: dict[str, list[float]]) -> None:
    """Append one (cpu, spark) calibration sample pair to ``samples``
    — called before the first timed pass and after the last, so the
    reported median brackets the timed region."""
    samples.setdefault("cpu_sha256_sec", []).append(_calib_probe_cpu())
    samples.setdefault("spark_range_agg_sec", []).append(
        _calib_probe_spark(spark)
    )


def stdout_payload(
    timings: dict[str, float],
    total: float,
    sf: float,
    calib: dict[str, float] | None = None,
) -> dict:
    """The driver-parsed stdout record: headline total, the machine-
    calibration anchors, and as many of the SLOWEST per-query timings
    as fit in STDOUT_LINE_BUDGET rendered chars. Deterministic (sort
    by -time then name); the full map is in bench_spread.json.
    n_queries/queries_omitted make the truncation visible to the
    driver rather than silent."""
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "calib": dict(sorted((calib or {}).items())),
        "queries": {},
        "sf": sf,
        "n_queries": len(timings),
        "queries_omitted": 0,
    }
    for name, sec in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        payload["queries"][name] = sec
        if len(json.dumps(payload)) > STDOUT_LINE_BUDGET:
            del payload["queries"][name]
            break
    payload["queries_omitted"] = len(timings) - len(payload["queries"])
    return payload


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    # a crash mid-run must not leave a PRIOR run's spread file lying
    # around to be misread against this run's stdout JSON
    spread_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_spread.json"
    )
    if os.path.exists(spread_path):
        os.remove(spread_path)

    load_all_queries()
    spark = get_spark(app_name="tfm-semisup-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen/classload warmup outside the timed region: run EVERY
    # headline query once at the tiny SF so steady-state throughput is
    # measured. First hits otherwise pay one-off costs per operator
    # family (MLlib LSH classload ~5s, Python/Arrow worker startup ~3s,
    # whole-stage-codegen compile) that a long-running cluster never
    # sees again.
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    # Same isolation as between timed queries: without this the FIRST
    # timed query absorbs cache/GC debt from the whole warmup phase
    # (flagship measured 8.9s vs ~1s steady-state).
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # calibration anchors bracket the timed region: 3 sample pairs
    # before pass 1, 3 after the last pass — a machine-state episode
    # confined to one end still moves the median visibly
    calib_samples: dict[str, list[float]] = {}
    for _ in range(3):
        measure_calibration(spark, calib_samples)
    # run-major interleaving: the outer loop is PASSES, the inner loop
    # queries — never all N samples of one query back-to-back
    for _ in range(runs):
        for name in HEADLINE:
            fn = QUERIES[name]
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - start)
            # Isolate queries from each other: drop cached plans, then
            # force a py->JVM GC so the ContextCleaner frees persist()/
            # checkpoint blocks whose handles just went out of scope.
            # Without this, storageFraction-protected leftovers steal
            # execution memory from the next query (measured: MinHash
            # 6s -> 65s when run after the components query on a 24g
            # heap that never GC'd).
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()

    for _ in range(3):
        measure_calibration(spark, calib_samples)
    calib = {
        name: round(statistics.median(s), 3)
        for name, s in calib_samples.items()
    }

    timings = {
        name: round(statistics.median(samples[name]), 3) for name in HEADLINE
    }
    total = round(sum(timings.values()), 3)
    # variance band to a sibling file FIRST (never stdout/stderr: the
    # driver merges both streams and parses the capture's last line)
    spread = {
        name: [round(min(s), 3), round(statistics.median(s), 3), round(max(s), 3)]
        for name, s in samples.items()
    }
    # write-to-temp-then-rename so a crash can never leave a partial
    # file; sf + optional run id in the payload identify which bench
    # run the spread belongs to (staleness detection)
    spread_payload = {
        "metric": "per_query_min_median_max_sec",
        "runs": runs,
        "sf": sf,
        "calib_samples": {
            n: [round(v, 3) for v in s] for n, s in calib_samples.items()
        },
        "spread": spread,
    }
    run_id = os.environ.get("SPARK_GRAFT_BENCH_RUN_ID")
    if run_id:
        spread_payload["run_id"] = run_id
    tmp_path = spread_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(spread_payload, f)
        f.write("\n")
    os.replace(tmp_path, spread_path)
    # stop the session BEFORE the stdout JSON: the driver merges
    # stdout+stderr and parses the capture's last line, so an
    # ERROR-level shutdown log landing after the JSON would re-break
    # parsing (the BENCH_r06 failure class)
    spark.stop()
    print(json.dumps(stdout_payload(timings, total, sf, calib)), flush=True)


if __name__ == "__main__":
    sys.exit(main())
