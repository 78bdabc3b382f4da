"""Named query registry.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered
under a stable name; SQL-expressible queries also register an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables
(driver contract in ``__spark_entry__.py``).

Output conventions (required for the driver's order-insensitive
value-hash compare):
- every computed column is explicitly aliased, identically in both the
  DataFrame code and the oracle SQL;
- floating-point aggregates are ``round``-ed (2-6 dp) on BOTH sides so
  engine-level summation-order ULP differences can't flip the hash;
- integer-valued derived columns are cast to BIGINT on both sides
  (Spark month() is int32, DuckDB sum(int) is HUGEINT, ...);
- timestamps in outputs are formatted as strings to dodge
  datetime64[ns]-vs-[us] dtype differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Driver-verification priority: the correctness driver evaluates the
# FIRST 50 oracled entries of queries() in dict order. This list pins
# the window to flagship + the 17 LLM-pipeline extension oracles
# (dedup/similarity/text/windows/rollup/multimodal — round 1 shipped
# them past the window with zero driver rows; round 2 adds
# chunking/packing) + the highest-value relational/ML-shape oracles.
# Oracled entries NOT listed here (the scalar-function batteries,
# grouping-set variants, scalar/IN subqueries, and q18 — all
# driver-green in CORRECTNESS_r01) follow in module-import order, past
# the window.
_ORACLE_PRIORITY = [
    "flagship_regional_revenue",
    # -- extension surface: every one of these needs a driver row --
    "dedup_exact_keepers",
    "dedup_ngram_jaccard_pairs",
    "dedup_ngram_jaccard_capped",
    "similarity_cosine_topk",
    "similarity_pairs_above",
    "text_stats_by_lang",
    "token_count_by_source",
    "quality_score_buckets",
    "lang_id_confusion",
    "doc_fingerprints",
    "corpus_pipeline_end_to_end",
    "tumbling_window_hourly",
    "sliding_window_2h_1h",
    "session_window_30m",
    "daily_rollup_by_type",
    "multimodal_feature_stub",
    # multimodal_chunk_sample: driver-green r2; yielded its slot to the
    # r3 resize tier (same Arrow plumbing family, zero lifetime rows).
    "multimodal_resize_stub",
    # -- r2 governance/mixing additions: first driver rows needed --
    "pii_redaction_report",
    "contamination_screen",
    # domain_mix_sample: driver-green r2; yielded its slot to the r3
    # deterministic training-shard shuffle (same md5-portability
    # family, zero lifetime rows).
    "training_shard_assignment",
    "repetition_report",
    "substring_dup_report",
    "substring_dup_cut_list",  # r3: per-span offsets — needs its first row
    # -- relational/ML-shape keepers (one per operator family) --
    "pricing_summary",
    # project_cast_derive: driver-green r2; yielded its slot to the r3
    # TPC-H shapes (see below).
    # filter_range_outliers: r01 driver-green; yielded its window slot
    # to substring_dup_cut_list (still oracled + locally verified).
    "nan_label_mask_stats",
    # topk_orders: driver-green r1 AND r2; yielded its slot to
    # q17_small_quantity_revenue (the one oracled plan shape — a
    # correlated scalar subquery — with zero lifetime driver rows).
    "class_distribution",
    "grid_results_join",
    "window_rank_top_order",
    "rollup_status_priority",
    "categorical_index_freq",
    "range_join_event_pairs",
    "asof_join_latest_order",
    # semi_join_urgent_customers / anti_join_orderless_customers:
    # driver-green r2; yielded their slots to q4 (EXISTS->left-semi)
    # and q16/q22 (NOT IN / NOT EXISTS->left-anti), which exercise the
    # same join shapes inside richer plans and have zero lifetime rows.
    "sql_api_segment_revenue",
    "grouped_pandas_value_trend",
    # project_cast_derive / embedding_norm_stats: driver-green r2;
    # yielded their slots to q13/q22 below.
    "conditional_distinct_users",
    "doc_chunks_overlap",
    "pack_token_bins",
    "q3_shipping_priority",
    "q14_promo_revenue_share",
    "q17_small_quantity_revenue",  # r3: first-ever driver row
    "q4_priority_with_returns",  # r3 new shape: EXISTS -> left-semi + agg
    "q13_customer_distribution",  # r3 new shape: outer join + count-of-counts
    "q16_supplier_diversity",  # r3 new shape: NOT IN anti + count distinct
    "q22_global_sales_opportunity",  # r3 new shape: scalar subquery + anti
    "similarity_topk_batch",  # r2 batch retrieval — needs its first row
    "dedup_planted_duplicates",
    "dedup_embedding_cosine_pairs",
    # round-2 additions needing their first driver row; the two r01
    # driver-green entries below them yield the 49th/50th slots.
    "quality_rule_report",
    "dedup_cluster_components",
    "dedup_incremental_new_docs",
    "dedup_exact_stats",
]


def _reorder_registries() -> None:
    """Rebuild QUERIES/ORACLES in priority order, in place (both dicts
    are imported by reference elsewhere)."""
    for registry in (QUERIES, ORACLES):
        ordered = {n: registry[n] for n in _ORACLE_PRIORITY if n in registry}
        ordered.update((n, v) for n, v in registry.items() if n not in ordered)
        registry.clear()
        registry.update(ordered)


def load_all_queries() -> None:
    """Import every query module so registration side effects run, then
    apply the driver-window priority order."""
    from tfm_semisup_spark.queries import relational  # noqa: F401
    from tfm_semisup_spark.queries import relational2  # noqa: F401
    from tfm_semisup_spark.queries import relational3  # noqa: F401
    from tfm_semisup_spark.queries import relational4  # noqa: F401
    from tfm_semisup_spark.queries import relational5  # noqa: F401
    from tfm_semisup_spark.queries import relational6  # noqa: F401
    from tfm_semisup_spark.queries import tpch_shapes  # noqa: F401
    from tfm_semisup_spark.queries import dedup  # noqa: F401
    from tfm_semisup_spark.queries import similarity  # noqa: F401
    from tfm_semisup_spark.queries import text_analysis  # noqa: F401
    from tfm_semisup_spark.queries import windows  # noqa: F401
    from tfm_semisup_spark.queries import multimodal  # noqa: F401
    from tfm_semisup_spark.queries import ssl_queries  # noqa: F401
    from tfm_semisup_spark.queries import corpus_prep  # noqa: F401
    from tfm_semisup_spark.queries import pii  # noqa: F401
    from tfm_semisup_spark.queries import contamination  # noqa: F401
    from tfm_semisup_spark.queries import sketches  # noqa: F401

    _reorder_registries()
