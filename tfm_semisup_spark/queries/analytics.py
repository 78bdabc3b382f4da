"""Behavioral-analytics shapes over the events table, plus the TPC-H
Q9 profit analog: the three classic product-analytics queries a
warehouse serves daily (funnel conversion, cohort retention,
profit-by-origin), each fully oracled.

These add plan shapes the windows/rollup family doesn't cover:
sequence-dependent conversion (MIN-over-conditional after a
self-referential time join), a cohort matrix (two aggregation
granularities of the same fact joined), and Q9's five-way join with a
computed measure spanning two tables' columns.

100 TB notes: the funnel's "purchase within 1h of first view" join is
a RANGE join keyed on user_id — shuffles on user_id, each user's rows
meet in one partition, the time predicate filters in place; no
cross-join of events with events. Retention aggregates the fact twice
(per-user first day, distinct user-days) — both shuffle on user_id,
and the cohort matrix join is per-user, not per-event. Q9's dims are
broadcast like the rest of the tpch_shapes2 battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
), conv AS (
  SELECT v.user_id
  FROM v
  JOIN events e
    ON e.user_id = v.user_id
   AND e.event_type = 'purchase'
   AND e.ts > v.first_view
   AND e.ts <= v.first_view + INTERVAL 1 HOUR
  GROUP BY v.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewers,
       CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted,
       ROUND(CAST((SELECT COUNT(*) FROM conv) AS DOUBLE)
             / (SELECT COUNT(*) FROM v), 4) AS conv_rate
"""


@register("funnel_view_purchase", FUNNEL_ORACLE)
def funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View -> purchase funnel: users whose FIRST view is followed by a
    purchase within one hour. The conversion probe is a user-keyed
    range join (one row per viewer against that user's purchases), so
    the shuffle key is user_id and the time window filters in-place."""
    events = load_table(spark, sf_dir, "events")
    first_view = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_view.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("first_view"))
            & (F.col("p_ts") <= F.col("first_view") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id")
        .distinct()
    )
    n_v = first_view.agg(F.count(F.lit(1)).alias("n_viewers"))
    n_c = converted.agg(F.count(F.lit(1)).alias("n_converted"))
    return (
        n_v.crossJoin(n_c)
        .select(
            "n_viewers",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double") / F.col("n_viewers"), 4
            ).alias("conv_rate"),
        )
    )


RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
       CAST(datediff('day', f.cohort_day, a.active_day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM firsts f
JOIN activity a ON a.user_id = f.user_id
WHERE datediff('day', f.cohort_day, a.active_day) IN (0, 1, 7)
GROUP BY f.cohort_day, day_offset
ORDER BY cohort, day_offset
"""


@register("retention_cohort_daily", RETENTION_ORACLE)
def retention_cohort_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0/1/7 cohort retention: users grouped by their first active
    day, counted again on the checkpoint offsets. Both inputs aggregate
    the fact per user/user-day BEFORE the join, so the matrix join is
    user-sized, not event-sized."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    firsts = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = events.select("user_id", day.alias("active_day")).distinct()
    offset = F.datediff("active_day", "cohort_day").cast("bigint")
    return (
        firsts.join(activity, "user_id")
        .withColumn("day_offset", offset)
        .where(F.col("day_offset").isin(0, 1, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            "day_offset",
            "n_users",
        )
        .orderBy("cohort", "day_offset")
    )


# TPC-H Q9 analog: the synthetic schema has no partsupp/ps_supplycost
# (TESTDATA.md), so cost is imputed as 0.5 * p_retailprice * quantity —
# the shape (five-way join, measure mixing lineitem and part columns,
# nation/year rollup) is what the query exercises, not the constant.
Q9_ORACLE = """
SELECT nation, o_year,
       ROUND(SUM(amount), 2) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.5 * p.p_retailprice * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        # part/supplier are SF-linear — no hints (AQE decides); the
        # 25-row nation keeps its hint.
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


GAP_FILL_ORACLE = """
WITH hours AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                TIMESTAMP '2024-01-05 23:00:00',
                                INTERVAL 1 HOUR)) AS hour
), counts AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS c
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
  GROUP BY 1
)
SELECT strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS n_events
FROM hours h LEFT JOIN counts c ON c.hour = h.hour
ORDER BY hour
"""


@register("timeseries_gap_fill", GAP_FILL_ORACLE)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with zero-filled gaps: the scaffold (24
    rows/day regardless of data volume) is generated with
    ``sequence`` + explode — a one-row driver expression, never a scan
    — and the sparse counts LEFT-join onto it. The dashboard shape
    every event store needs; at 100 TB the scaffold stays O(hours)
    while the counts aggregate prunes to the day's partition."""
    events = load_table(spark, sf_dir, "events")
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-05 00:00:00").cast("timestamp"),
                F.lit("2024-01-05 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    counts = (
        events.where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-06").cast("timestamp"))
        )
        .groupBy(F.date_trunc("hour", "ts").alias("c_hour"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        hours.join(counts, hours["hour"] == counts["c_hour"], "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("hour")
    )


# Explicit GROUPING SETS — a NON-hierarchical set list ((status),
# (priority), ()) that neither ROLLUP nor CUBE expresses; identical
# SQL text on both engines (the q17/sql_api pattern).
GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""

GROUPING_SETS_ORACLE = GROUPING_SETS_SQL


@register("grouping_sets_status_priority", GROUPING_SETS_ORACLE)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS with disjoint single-key sets + grand
    total: one Expand + one aggregate in Spark's plan (no union of
    scans). Same SQL text on both engines."""
    from tfm_semisup_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------
#
# Marketing-analytics staple: attribute each purchase to the user's
# most recent PRECEDING non-purchase event. One pass: a per-user
# window carrying the last non-purchase (ts, type) struct with IGNORE
# NULLS over ROWS UNBOUNDED PRECEDING..1 PRECEDING — no self-join, no
# re-scan; shuffle keys are user ids, the natural sessionization
# partitioning. Timestamps cross the compare as wall-clock strings and
# the gap as a microsecond DIFFERENCE (timezone offsets cancel), per
# the repo's ts-portability conventions.

ATTRIBUTION_ORACLE = """
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(
           CASE WHEN event_type <> 'purchase'
                THEN struct_pack(ats := ts, atype := event_type) END
           IGNORE NULLS
         ) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS attr
  FROM events
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       attr.atype AS attr_type,
       (epoch_us(ts) - epoch_us(attr.ats))::BIGINT AS attr_gap_us
FROM seq
WHERE event_type = 'purchase' AND attr IS NOT NULL
ORDER BY event_id
"""


@register("attribution_last_touch", ATTRIBUTION_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase with its most recent preceding non-purchase event:
    (event_id, user_id, purchase_ts, attr_type, attr_gap_us)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attr = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("ts").alias("ats"), F.col("event_type").alias("atype")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("attr", attr)
        .where((F.col("event_type") == "purchase") & F.col("attr").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.col("attr.atype").alias("attr_type"),
            (F.unix_micros("ts") - F.unix_micros("attr.ats")).alias("attr_gap_us"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Item co-occurrence (co-visitation)
# ---------------------------------------------------------------------------
#
# Recommender/corpus-curation staple: item pairs engaged by the same
# user. The quadratic hazard is per-user: a power-user with 10k items
# contributes 50M pairs — so each user's item set is CAPPED to its
# top-COOC_CAP items by engagement count first (deterministic
# (count DESC, item) rank), the same bounded-candidate trade as every
# LSH/banding tier. After the cap the self-join is per-user bounded:
# candidates <= |users| * COOC_CAP², linear in users.

COOC_CAP = 20
COOC_TOP = 15

COOC_ORACLE = f"""
WITH engaged AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         COUNT(*)::BIGINT AS cnt
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY user_id, item
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY cnt DESC, item
           ) AS rk
    FROM engaged
  ) WHERE rk <= {COOC_CAP}
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS n_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
)
SELECT item_a, item_b, n_users
FROM pairs
ORDER BY n_users DESC, item_a, item_b
LIMIT {COOC_TOP}
"""


def _capped_item_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, items ARRAY): each user's top-COOC_CAP engaged items
    by (cnt DESC, item ASC), as ONE groupBy aggregate — r14 fusion of
    the row_number window the capped derivation used (guide §2.4: the
    window's exchange+sort and the downstream self-join collapse into
    an array sort of a ≤per-user-item-count list). The struct sort on
    (-cnt, item) is EXACTLY the window's (cnt DESC, item) total order;
    the slice keeps the same top COOC_CAP rows. The output array is
    re-sorted ascending by item so suffix-explode pair generation
    emits item_a < item_b directly. NULL engagement keys are excluded
    STRUCTURALLY (isNotNull below; same filter in the window-form
    equivalence test): the non-null struct(-cnt, item) wrapper would
    otherwise RETAIN a NULL item through collect_list (ADVICE r14 —
    the earlier comment claimed the opposite), letting it occupy a cap
    slot and explode into (item, NULL) pairs the old self-join's
    item_a < item_b predicate filtered. The engagement key is non-null
    at every measured SF (0 of 398/3988 view/click rows at the gate
    SFs), so the filter changes no result — it turns the corpus
    invariant into code."""
    events = load_table(spark, sf_dir, "events")
    engaged = (
        events.where(F.col("event_type").isin("view", "click"))
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("user_id", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct((-F.col("cnt")).alias("nc"), F.col("item").alias("item"))
            )
        ),
        1,
        COOC_CAP,
    )
    return engaged.groupBy("user_id").agg(
        F.array_sort(F.transform(top, lambda s: s["item"])).alias("items")
    )


def _cooc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_a, item_b, n_users) over the per-user capped engagement
    sets — shared by the co-occurrence top-k and the PageRank graph.
    r14: pairs come from the suffix-explode Generate over the capped
    arrays (no self-join, one less exchange; the _basket_pairs recipe)."""
    sets_ = _capped_item_sets(spark, sf_dir)
    return (
        sets_.select(F.posexplode("items").alias("i", "item_a"), "items")
        .select(
            "item_a",
            F.explode(
                F.slice("items", F.col("i") + F.lit(2), F.size("items"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def _order_part_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order sorted distinct part sets: (okey, parts ARRAY).

    ONE map-side-combinable aggregate replaces the DISTINCT(okey, part)
    projection the co-order family used to self-join (r14, guide §2.4
    "remove shuffles outright"): basket width is bounded (TPC-H ≤7
    lines/order at any SF), so the array is constant-size and every
    consumer derives from one exchange instead of a distinct + join."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )


def _basket_pairs(baskets: DataFrame) -> DataFrame:
    """(pa, pb) co-ordered part pairs with pa < pb BY CONSTRUCTION —
    the basket array is sorted ascending and strictly increasing (a
    set), so exploding suffixes yields exactly the C(w,2) pairs the
    okey self-join produced, as a narrow Generate chain with no join
    and no exchange (r14, guide §2.4)."""
    return baskets.select(
        F.posexplode("parts").alias("i", "pa"), "parts"
    ).select(
        "pa",
        F.explode(
            F.slice("parts", F.col("i") + F.lit(2), F.size("parts"))
        ).alias("pb"),
    )


@register("item_cooccurrence_topk", COOC_ORACLE)
def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-visited item pairs: (item_a, item_b, n_users), capped at
    COOC_CAP items per user before pairing."""
    return (
        _cooc_pairs(spark, sf_dir)
        .orderBy(F.col("n_users").desc(), "item_a", "item_b")
        .limit(COOC_TOP)
    )


# ---------------------------------------------------------------------------
# Triangle counting over the co-engagement graph
# ---------------------------------------------------------------------------
#
# Graph-analytics staple (clustering-coefficient numerator, community
# density). Edges are the capped co-visitation pairs with >=
# TRI_MIN_USERS users, kept in their canonical a<b orientation — the
# classic ORIENTED triangle enumeration: join e(a,b) with e(b,c) on
# the shared middle vertex, then probe e(a,c); a<b<c by construction,
# so each triangle is found exactly once with NO symmetrization blowup
# (the 6x duplicate-then-dedup a naive undirected join pays).
#
# 100 TB shape: two equi-join shuffles keyed on a vertex. The wedge
# count (join 1's output) is sum-of-squares of vertex degrees — the
# skew hazard — already bounded here by the per-user engagement cap
# plus the support threshold; at web scale the standard extra lever is
# degree orientation (point edges low-degree -> high-degree before the
# wedge join), noted for parity with the published algorithms.

TRI_MIN_USERS = 2

TRIANGLE_ORACLE = f"""
WITH engaged AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         COUNT(*)::BIGINT AS cnt
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY user_id, item
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY cnt DESC, item
           ) AS rk
    FROM engaged
  ) WHERE rk <= {COOC_CAP}
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS n_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
),
edges AS (
  SELECT item_a, item_b FROM pairs WHERE n_users >= {TRI_MIN_USERS}
),
tri AS (
  SELECT e1.item_a AS a, e1.item_b AS b, e2.item_b AS c
  FROM edges e1
  JOIN edges e2 ON e2.item_a = e1.item_b
  JOIN edges e3 ON e3.item_a = e1.item_a AND e3.item_b = e2.item_b
),
members AS (
  SELECT a AS item FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT item, COUNT(*) AS n_triangles
FROM members
GROUP BY item
"""


@register("item_triangle_counts", TRIANGLE_ORACLE)
def item_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item triangle participation over the thresholded
    co-engagement graph: oriented wedge join (e_ab ⋈ e_bc on b) +
    closing-edge probe (a, c), then one explode-free member count —
    each triangle contributes once to each of its three vertices."""
    edges = (
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= TRI_MIN_USERS)
        .select("item_a", "item_b")
    )
    # one upstream evaluation feeds all three join legs
    edges = edges.localCheckpoint(eager=True)
    e1 = edges.select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    e2 = edges.select(F.col("item_a").alias("b2"), F.col("item_b").alias("c"))
    e3 = edges.select(F.col("item_a").alias("a3"), F.col("item_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    members = (
        tri.select(F.col("a").alias("item"))
        .unionAll(tri.select(F.col("b").alias("item")))
        .unionAll(tri.select(F.col("c").alias("item")))
    )
    return members.groupBy("item").agg(F.count(F.lit(1)).alias("n_triangles"))


# ---------------------------------------------------------------------------
# PageRank over the co-engagement graph
# ---------------------------------------------------------------------------
#
# Corpus-curation signal: rank items/domains by graph centrality (the
# CommonCrawl-style crawl-priority rank). Edges are the capped
# co-visitation pairs above with >= PR_MIN_USERS users, symmetrized;
# the operator (operators/pagerank.py) runs PR_ITERS checkpointed
# power iterations — two long-key shuffles per round, O(1) lineage.
# The oracle UNROLLS the same fixed iteration count as a chained CTE
# (standard SQL forbids aggregation inside a recursive term), so both
# engines execute the identical dataflow. Ranks are rounded (8 dp,
# values ~1e-2) before the top-k cut; item breaks ties.

PR_ITERS = 5
PR_MIN_USERS = 2
PR_TOP = 20


def _pagerank_oracle() -> str:
    head = f"""
WITH engaged AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         COUNT(*)::BIGINT AS cnt
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY user_id, item
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY cnt DESC, item
           ) AS rk
    FROM engaged
  ) WHERE rk <= {COOC_CAP}
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS n_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
),
e AS (
  SELECT item_a AS src, item_b AS dst FROM pairs WHERE n_users >= {PR_MIN_USERS}
  UNION ALL
  SELECT item_b AS src, item_a AS dst FROM pairs WHERE n_users >= {PR_MIN_USERS}
),
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM e GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank, nn.n AS n FROM nodes CROSS JOIN nn)"""
    rounds = "".join(
        f""",
r{k} AS (
  SELECT e.dst AS node, 0.15 / r.n + 0.85 * SUM(r.rank / d.deg) AS rank, r.n AS n
  FROM e JOIN r{k - 1} r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst, r.n
)"""
        for k in range(1, PR_ITERS + 1)
    )
    tail = f"""
SELECT node AS item, round(rank, 8) AS rank
FROM r{PR_ITERS}
ORDER BY round(rank, 8) DESC, node
LIMIT {PR_TOP}
"""
    return head + rounds + tail


PAGERANK_ORACLE = _pagerank_oracle()


@register("item_pagerank", PAGERANK_ORACLE)
def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-PR_TOP items by PageRank over the symmetric co-engagement
    graph: (item, rank)."""
    from tfm_semisup_spark.operators.lineage import release, truncate
    from tfm_semisup_spark.operators.pagerank import pagerank

    # materialize the pair list once: it appears on BOTH sides of the
    # symmetrizing union, and the whole co-occurrence pipeline (events
    # scan, two aggregates, per-user window, self-join) would otherwise
    # execute twice per downstream action
    pairs = truncate(
        _cooc_pairs(spark, sf_dir).where(F.col("n_users") >= PR_MIN_USERS)
    )
    edges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    pr = pagerank(edges, damping=0.85, iters=PR_ITERS)
    out = truncate(
        pr.select(F.col("node").alias("item"), F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), "item")
        .limit(PR_TOP)
    )
    release(pairs)
    release(pr)
    return out


# Event-path bigrams: the sequence-mining primitive (what do users do
# NEXT) — per-user event stream ordered by time, adjacent
# (step, next_step) pairs counted corpus-wide. One user-keyed window
# (LEAD), one pair aggregate; the final top-k is
# TakeOrderedAndProject. Ties broken by the pair itself so the cutoff
# row is deterministic in both engines.
PATH_BIGRAMS_ORACLE = """
SELECT step, next_step, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT event_type AS step,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_step
  FROM events
)
WHERE next_step IS NOT NULL
GROUP BY step, next_step
ORDER BY n DESC, step, next_step
LIMIT 20
"""


@register("event_path_bigrams", PATH_BIGRAMS_ORACLE)
def event_path_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent event-type transitions: (step, next_step, n)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("step"),
            F.lead("event_type").over(w).alias("next_step"),
        )
        .where(F.col("next_step").isNotNull())
        .groupBy("step", "next_step")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "step", "next_step")
        .limit(20)
    )


# Rolling 7-day distinct actives: COUNT(DISTINCT) over a sliding
# window has no distributed window form — the scale-correct
# re-expression EXPLODES each (user, activity-day) into the 7 window
# end-days it contributes to, then runs an ordinary distinct +
# groupBy. Shuffle volume is 7x the per-day distinct user set (tiny
# vs events), every stage is a plain hash aggregate, and the same
# construction runs verbatim in DuckDB. Window end-days past the data
# edge are filtered so every reported day has a full observation
# window of real data behind it.
ROLLING_ACTIVES_ORACLE = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
contrib AS (
  SELECT DISTINCT user_id, day + CAST(o AS INT) AS wday
  FROM user_days, UNNEST(generate_series(0, 6)) AS t(o)
)
SELECT strftime(wday, '%Y-%m-%d') AS window_end_day,
       CAST(COUNT(*) AS BIGINT) AS active_users_7d
FROM contrib, bounds
WHERE wday <= max_day
GROUP BY wday
"""


@register("rolling_7d_active_users", ROLLING_ACTIVES_ORACLE)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users active in the 7 days ending each day:
    (window_end_day, active_users_7d) — sliding-distinct via the
    explode re-expression (no distinct-over-window exists)."""
    from tfm_semisup_spark.operators.lineage import truncate

    events = load_table(spark, sf_dir, "events")
    # ONE corpus scan: the data edge (max day) derives from the same
    # distinct (user, day) relation the explode consumes — checkpointed
    # so the two consumers read one materialization, never a second
    # events pass. max(day of distinct user-days) == max(date(ts)).
    user_days = truncate(
        events.select(
            "user_id", F.col("ts").cast("date").alias("day")
        ).distinct()
    )
    max_day = F.broadcast(user_days.agg(F.max("day").alias("max_day")))
    contrib = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(6))
            ).alias("o"),
            "day",
        )
        .select("user_id", F.date_add("day", F.col("o")).alias("wday"))
        .distinct()
    )
    return (
        contrib.crossJoin(max_day)
        .where(F.col("wday") <= F.col("max_day"))
        .groupBy("wday")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users_7d"))
        .select(
            F.date_format("wday", "yyyy-MM-dd").alias("window_end_day"),
            "active_users_7d",
        )
    )


# Event-path TRIGRAMS with second-order lift (r10): the 3-step
# extension of event_path_bigrams. Lift compares the observed trigram
# frequency against the first-order Markov prediction from its two
# bigrams — lift = n(abc)·n(b) / (n(ab)·n(bc)) — i.e. how much
# second-order memory the path carries (1.0 = the chain is
# first-order). Counts come from the same ONE user-keyed window pass
# (LEAD and LEAD,2 share the frame); all grids are |types|-bounded
# (≤ 125 trigram cells), and the single double division happens per
# output cell. The middle-state count n(b) deliberately counts rows
# with a successor (bigram-start occurrences) so numerator and
# denominator marginals agree.
PATH_TRIGRAMS_ORACLE = """
WITH seq AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS c
  FROM events
),
tri AS (
  SELECT a, b, c, COUNT(*)::HUGEINT AS n3 FROM seq
  WHERE c IS NOT NULL GROUP BY a, b, c
),
bi AS (
  SELECT a, b, COUNT(*)::HUGEINT AS n2 FROM seq
  WHERE b IS NOT NULL GROUP BY a, b
),
uni AS (
  SELECT a, COUNT(*)::HUGEINT AS n1 FROM seq
  WHERE b IS NOT NULL GROUP BY a
)
SELECT tri.a AS step1, tri.b AS step2, tri.c AS step3,
       tri.n3::BIGINT AS n,
       ROUND(CAST(tri.n3 * u.n1 AS DOUBLE)
             / CAST(ab.n2 * bc.n2 AS DOUBLE), 6) AS lift
FROM tri
JOIN bi ab ON tri.a = ab.a AND tri.b = ab.b
JOIN bi bc ON tri.b = bc.a AND tri.c = bc.b
JOIN uni u ON tri.b = u.a
ORDER BY n DESC, step1, step2, step3
LIMIT 20
"""


@register("event_path_trigrams", PATH_TRIGRAMS_ORACLE)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step event sequences with second-order lift:
    (step1, step2, step3, n, lift)."""
    from pyspark.sql import Window

    from tfm_semisup_spark.operators.lineage import truncate

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    # ONE corpus-scale window pass: aggregate straight onto the
    # (a, b, c-nullable) grid (<= 150 cells) and checkpoint it; tri, bi
    # and uni all derive from the grid — three un-materialized
    # consumers would re-run the user-keyed sort + LEAD per consumer,
    # the theilsen redundant-scan class
    seqg = truncate(
        seq.where(F.col("b").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt")),
        eager=True,
    )
    tri = seqg.where(F.col("c").isNotNull()).select(
        "a", "b", "c", F.col("cnt").alias("n3")
    )
    bi = seqg.groupBy("a", "b").agg(F.sum("cnt").alias("n2"))
    uni = seqg.groupBy("a").agg(F.sum("cnt").alias("n1"))
    ab = bi.select(
        F.col("a").alias("ab_a"), F.col("b").alias("ab_b"), F.col("n2").alias("n2_ab")
    )
    bc = bi.select(
        F.col("a").alias("bc_a"), F.col("b").alias("bc_b"), F.col("n2").alias("n2_bc")
    )
    u = uni.select(F.col("a").alias("u_b"), "n1")
    return (
        tri.join(
            F.broadcast(ab),
            (F.col("a") == F.col("ab_a")) & (F.col("b") == F.col("ab_b")),
        )
        .join(
            F.broadcast(bc),
            (F.col("b") == F.col("bc_a")) & (F.col("c") == F.col("bc_b")),
        )
        .join(F.broadcast(u), F.col("b") == F.col("u_b"))
        .select(
            F.col("a").alias("step1"),
            F.col("b").alias("step2"),
            F.col("c").alias("step3"),
            F.col("n3").cast("bigint").alias("n"),
            F.round(
                (F.col("n3") * F.col("n1")).cast("double")
                / (F.col("n2_ab") * F.col("n2_bc")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(20)
    )
