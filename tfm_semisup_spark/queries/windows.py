"""Event-time windowing (extension surface, SURVEY.md §2.3).

The reference has no window/streaming semantics; the `events` table
exists to exercise them. Batch forms here mirror the Structured
Streaming forms in ``streaming/`` — same ``F.window`` /
``F.session_window`` expressions work under ``readStream``.

Output timestamps are formatted as strings (driver-hash dtype safety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"

TUMBLING_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1
"""


@register("tumbling_window_hourly", TUMBLING_ORACLE)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "n",
            "sum_value",
        )
    )


# Streaming-materialized tier (VERDICT r4 #7): the batch tumbling
# aggregate above is stream==batch SMOKE-tested; this entry gives the
# driver a HASH-CHECKABLE streaming artifact. The query runs a real
# ``readStream`` micro-batch pass (availableNow) with a 2-hour
# watermark in APPEND mode through a ``foreachBatch`` parquet sink,
# then reads the materialized table back. Append mode only releases a
# window once the watermark passes its end, so the emitted set is
# exactly {windows w : w.end <= max(ts) - 2h} — the terminal watermark
# is data-determined (single-file source => one data micro-batch, no
# late drops), making the run deterministic and SQL-expressible: the
# oracle computes the same aggregate with the same HAVING cutoff
# directly from `events`. Boundary pinned empirically: Spark emits at
# end == watermark (<=, not <); window ends sit on hour boundaries
# while the watermark is ms-truncated, so the comparators can only
# disagree if max(ts) is sub-ms off a whole hour AND exactly 2h after
# a window end — impossible at once.
STREAMING_TUMBLING_ORACLE = """
WITH wm AS (SELECT max(ts) - INTERVAL '2 hours' AS w FROM events)
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events, wm
GROUP BY time_bucket(INTERVAL '1 hour', ts), wm.w
HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' <= wm.w
"""


@register("streaming_tumbling_finalized", STREAMING_TUMBLING_ORACLE)
def streaming_tumbling_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-finalized hourly counts via a REAL micro-batch run:
    readStream -> withWatermark(2h) -> window(1h) agg -> append-mode
    foreachBatch parquet sink -> batch read of the artifact. Output
    (window_start, n, sum_value) — only windows the watermark closed.
    The artifact lands in a fresh session-scoped temp dir (it must
    outlive this call: the returned DataFrame scans it lazily)."""
    import tempfile

    from tfm_semisup_spark.streaming.events import (
        materialize_stream_to_parquet,
        read_events_stream,
        tumbling_counts_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_tumbling_")
    stream = read_events_stream(spark, sf_dir)
    result = tumbling_counts_stream(stream, window="1 hour", watermark="2 hours")
    materialize_stream_to_parquet(result, f"{base}/out", f"{base}/ckpt")
    return spark.read.parquet(f"{base}/out").select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "n",
        "sum_value",
    )


# Second streaming-materialized tier: STATEFUL session windows. Same
# availableNow/append/foreachBatch contract as streaming_tumbling_
# finalized, but the state is Spark's session-merging store, so this
# oracles the harder streaming primitive. A session's window end is
# last_event + gap; append mode releases it once end <= watermark
# (same boundary as the tumbling tier). Spark's event-time watermark
# is MILLISECOND-truncated (event times are tracked in ms) while
# session ends sit on event-time microseconds, so the oracle truncates
# max(ts) to ms BEFORE subtracting the delay — parity holds by
# construction instead of relying on no session closing in the sub-ms
# band (ADVICE r5). The oracle rebuilds the
# sessions with the gaps-and-islands construction of SESSION_ORACLE
# and applies the same finalization cutoff.
STREAMING_SESSIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start,
         MAX(ts) AS session_end,
         COUNT(*) AS n_events
  FROM sessions GROUP BY 1, 2
),
wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL '2 hours' AS w
       FROM events)
SELECT user_id,
       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(n_events AS BIGINT) AS n_events
FROM per_session, wm
WHERE session_end + INTERVAL '30 minutes' <= wm.w
"""


@register("streaming_sessions_finalized", STREAMING_SESSIONS_ORACLE)
def streaming_sessions_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-finalized per-user sessions via a REAL micro-batch
    run: readStream -> withWatermark(2h) -> session_window(30m) ->
    append-mode foreachBatch parquet sink -> batch read. Output
    (user_id, session_start, n_events) — only sessions the watermark
    closed."""
    import tempfile

    from tfm_semisup_spark.streaming.events import (
        materialize_stream_to_parquet,
        read_events_stream,
        session_counts_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_sessions_")
    stream = read_events_stream(spark, sf_dir)
    result = session_counts_stream(stream, gap="30 minutes", watermark="2 hours")
    materialize_stream_to_parquet(result, f"{base}/out", f"{base}/ckpt")
    return spark.read.parquet(f"{base}/out").select(
        "user_id",
        F.date_format("session_start", TS_FMT).alias("session_start"),
        "n_events",
    )


# Sliding-window streaming tier — completes the window triad
# (tumbling/session/sliding all have hash-checked artifacts). Same
# availableNow/append/foreachBatch contract; a 2h-window-1h-slide
# event lands in exactly two windows, and append mode releases a
# window once end <= watermark. Window ends sit on hour boundaries
# while the ms-truncated watermark would need max(ts) sub-ms off a
# whole hour AND exactly 2h after a window end to disagree —
# impossible at once (same argument as the tumbling tier).
STREAMING_SLIDING_ORACLE = """
WITH wm AS (SELECT max(ts) - INTERVAL '2 hours' AS w FROM events),
exploded AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS ws, value
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM exploded, wm
GROUP BY ws, wm.w
HAVING ws + INTERVAL '2 hours' <= wm.w
"""


@register("streaming_sliding_finalized", STREAMING_SLIDING_ORACLE)
def streaming_sliding_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-finalized 2h/1h sliding counts via a REAL micro-batch
    run — the sliding twin of streaming_tumbling_finalized."""
    import tempfile

    from tfm_semisup_spark.streaming.events import (
        materialize_stream_to_parquet,
        read_events_stream,
        tumbling_counts_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_sliding_")
    stream = read_events_stream(spark, sf_dir)
    result = tumbling_counts_stream(
        stream, window="2 hours", watermark="2 hours", slide="1 hour"
    )
    materialize_stream_to_parquet(result, f"{base}/out", f"{base}/ckpt")
    return spark.read.parquet(f"{base}/out").select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "n",
        "sum_value",
    )


# Third streaming-materialized tier (VERDICT r5 #4): INGEST DEDUP via
# dropDuplicatesWithinWatermark — the last major streaming primitive
# that was stream==batch smoke-only. Same availableNow/append/
# foreachBatch artifact contract as the window tiers. Determinism: the
# single-file source yields ONE data micro-batch whose starting
# watermark is the epoch, so no row is late-dropped and no state is
# evicted mid-batch — each distinct fingerprint is emitted exactly
# once. WHICH physical row survives per fingerprint is
# partitioning-dependent, so the artifact projects only columns that
# are functions of the fingerprint itself (fp, event_type); the batch
# read then aggregates to per-type unique-key counts, which the oracle
# states directly as COUNT(DISTINCT user_id) — an inflated count would
# expose any duplicate emission, a deflated one any wrong late-drop.
STREAMING_DEDUP_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_unique_users
FROM events
GROUP BY event_type
"""


@register("streaming_dedup_finalized", STREAMING_DEDUP_ORACLE)
def streaming_dedup_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded ingest dedup via a REAL micro-batch run:
    readStream -> fingerprint (md5 of user_id|event_type) ->
    dropDuplicatesWithinWatermark -> append-mode foreachBatch parquet
    sink -> batch read + per-type rollup. State is bounded by the
    2-hour watermark horizon (the property that matters on an
    unbounded feed); output (event_type, n_unique_users)."""
    import tempfile

    from tfm_semisup_spark.streaming.dedup import stream_exact_dedup
    from tfm_semisup_spark.streaming.events import (
        materialize_stream_to_parquet,
        read_events_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_dedup_")
    stream = read_events_stream(spark, sf_dir).withColumn(
        "__key", F.concat_ws("|", F.col("user_id"), F.col("event_type"))
    )
    deduped = stream_exact_dedup(
        stream, ts_col="ts", text_col="__key", watermark="2 hours"
    ).select("fp", "event_type")
    materialize_stream_to_parquet(deduped, f"{base}/out", f"{base}/ckpt")
    return (
        spark.read.parquet(f"{base}/out")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
    )


# Stream-static anti-join tier: the incremental-ingest half of
# streaming dedup (streaming/dedup.py stream_new_docs_vs_corpus) —
# documents stream in and only those absent from the already-ingested
# corpus fingerprint set pass. No event time or watermark is involved
# (stream-static joins are stateless per micro-batch), so the
# documents table streams directly; the static set is the md5 of
# every doc_id % 5 == 0 document, giving a deterministic pass set the
# oracle states as NOT IN. Closes the last smoke-only function in the
# streaming dedup family.
# NULL texts are filtered on BOTH sides up front: SQL NOT IN goes
# three-valued on NULLs while Spark's left anti keeps a null key —
# excluding unfingerprintable docs explicitly keeps the engines
# agreeing by construction.
STREAMING_NEW_DOCS_ORACLE = """
SELECT d.doc_id, d.lang
FROM documents d
WHERE d.text IS NOT NULL
  AND md5(d.text) NOT IN (
    SELECT md5(text) FROM documents
    WHERE doc_id % 5 = 0 AND text IS NOT NULL
  )
"""


@register("streaming_new_docs_finalized", STREAMING_NEW_DOCS_ORACLE)
def streaming_new_docs_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-corpus ingest filter via a REAL micro-batch run:
    readStream over documents -> md5 fingerprint LEFT ANTI join
    against the static known-fingerprint set -> append foreachBatch
    parquet artifact -> batch read. Output (doc_id, lang)."""
    import tempfile

    from tfm_semisup_spark.streaming.dedup import stream_new_docs_vs_corpus
    from tfm_semisup_spark.streaming.events import materialize_stream_to_parquet

    base = tempfile.mkdtemp(prefix="tfm_stream_newdocs_")
    docs_path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(docs_path).schema
    # glob form: the file source rejects a literal single-file path
    stream = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/documents.parque*")
        .where(F.col("text").isNotNull())
    )
    known = (
        spark.read.parquet(docs_path)
        .where((F.col("doc_id") % 5 == 0) & F.col("text").isNotNull())
        .select(F.md5("text").alias("fp"))
    )
    fresh = stream_new_docs_vs_corpus(stream, known).select("doc_id", "lang")
    materialize_stream_to_parquet(fresh, f"{base}/out", f"{base}/ckpt")
    return spark.read.parquet(f"{base}/out").select("doc_id", "lang")


# Fourth streaming-materialized tier: STREAM-STREAM interval join.
# Inner-join matches are final the moment both sides are present, so
# append mode emits every pair inside the single availableNow data
# micro-batch; the watermarks + two-sided time bound are what let
# Spark evict buffered state (the 100 TB property), not an emission
# gate here. The emitted PAIR SET (l_event, r_event) is deterministic
# regardless of partitioning; the artifact is rolled up per user so
# the compare stays small, and the oracle is the batch range-join SQL
# (the batch twin of streaming/events.py::interval_join_stream).
STREAMING_INTERVAL_JOIN_ORACLE = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL '5 minutes'
GROUP BY a.user_id
"""


@register("streaming_interval_join_finalized", STREAMING_INTERVAL_JOIN_ORACLE)
def streaming_interval_join_finalized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream interval join via a REAL micro-batch run: two
    readStream legs over events, watermarked user-keyed join pairing
    each event with same-user events in the following 5 minutes,
    append-mode foreachBatch parquet sink, batch read + per-user pair
    count. Output (user_id, n_pairs) — must equal the batch range
    join."""
    import tempfile

    from tfm_semisup_spark.streaming.events import (
        interval_join_stream,
        materialize_stream_to_parquet,
        read_events_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_ivjoin_")
    pairs = interval_join_stream(
        read_events_stream(spark, sf_dir),
        read_events_stream(spark, sf_dir),
        interval="5 minutes",
        watermark="2 hours",
    ).select("l_user", "l_event", "r_event")
    materialize_stream_to_parquet(pairs, f"{base}/out", f"{base}/ckpt")
    return (
        spark.read.parquet(f"{base}/out")
        .groupBy(F.col("l_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# Fifth streaming-materialized tier: the CUSTOM STATEFUL operator
# (applyInPandasWithState running per-user totals) — the one streaming
# primitive family still without a hash check. Update mode re-emits a
# user per micro-batch that touches it; the single-file availableNow
# source gives exactly one data batch, so the artifact holds exactly
# one row per user whose running total equals the full per-user count
# and whose last_ts is the per-user max — both order-insensitive, so
# the oracle is a plain GROUP BY. A state-handling bug (lost state,
# double count, wrong key routing) would inflate/deflate the totals.
STREAMING_STATEFUL_ORACLE = """
SELECT user_id,
       COUNT(*) AS total_events,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
GROUP BY user_id
"""


@register("streaming_stateful_user_totals", STREAMING_STATEFUL_ORACLE)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user event totals via the REAL stateful hook:
    readStream -> applyInPandasWithState (one long of state per user,
    sharded by the grouping key) -> update-mode foreachBatch parquet
    sink -> batch read. Output (user_id, total_events, last_ts)."""
    import tempfile

    from tfm_semisup_spark.streaming.events import (
        materialize_stream_to_parquet,
        read_events_stream,
        running_user_counts_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_stateful_")
    result = running_user_counts_stream(read_events_stream(spark, sf_dir))
    materialize_stream_to_parquet(
        result, f"{base}/out", f"{base}/ckpt", output_mode="update"
    )
    return spark.read.parquet(f"{base}/out").select(
        "user_id",
        F.col("total_events"),
        F.date_format("last_ts", TS_FMT).alias("last_ts"),
    )


SLIDING_ORACLE = """
WITH exploded AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS window_start, value
  FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM exploded
GROUP BY 1
"""


@register("sliding_window_2h_1h", SLIDING_ORACLE)
def sliding_window_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour: each event lands in exactly two
    windows; Spark's F.window handles the explode internally."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "n",
            "sum_value",
        )
    )


# Session windows: 30-minute inactivity gap per user. Spark side uses the
# native F.session_window (same operator Structured Streaming uses with
# state); the oracle reconstructs sessions relationally with
# lag + cumulative sum — the classic sessionization identity.
SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sessions GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(SUM(n_events) * 1.0 / COUNT(*), 4) AS avg_events_per_session
FROM per_session
GROUP BY user_id
"""


@register("session_window_30m", SESSION_ORACLE)
def session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_session = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("n_events") * 1.0 / F.count(F.lit(1)), 4).alias(
                "avg_events_per_session"
            ),
        )
    )


# Session stats rolled up to the session-START day (ROADMAP r3: the
# per-user session query's output grows with the user population —
# 150 rows at sf0.01, 1500 at sf0.1, ~150k at sf10 — while this
# day-keyed variant is bounded by the TIME SPAN at any corpus size,
# the right read shape for a driver compare or a dashboard at 100 TB.
# Tumbling/sliding need no such variant: their cardinality is already
# time-bounded (720/721 rows at every SF, measured).
SESSION_DAILY_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start,
         COUNT(*) AS n_events
  FROM sessions GROUP BY 1, 2
)
SELECT strftime(date_trunc('day', session_start), '%Y-%m-%d') AS day,
       COUNT(*) AS n_sessions,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(SUM(n_events) * 1.0 / COUNT(*), 4) AS avg_events_per_session
FROM per_session
GROUP BY 1
"""


@register("session_stats_daily", SESSION_DAILY_ORACLE)
def session_stats_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-bounded session rollup: native session_window per user, then
    aggregate keyed by the session's start DAY. Output cardinality is
    the covered time span — independent of corpus size — so the result
    stays collectable at any SF. Same two-shuffle shape as the per-user
    query (session state keyed by user, then a tiny day aggregate)."""
    events = load_table(spark, sf_dir, "events")
    per_session = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_session.select(
            F.date_format(
                F.date_trunc("day", F.col("session_window.start")), "yyyy-MM-dd"
            ).alias("day"),
            "user_id",
            "n_events",
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("n_events") * 1.0 / F.count(F.lit(1)), 4).alias(
                "avg_events_per_session"
            ),
        )
    )


# Day-level rollup (the read shape served by the incremental
# hypertable-style rollup in operators/rollup_table.py; here computed
# directly so DuckDB can check the aggregation semantics).
DAILY_ROLLUP_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


# Incremental-maintenance check for the hypertable rollup: the
# MATERIALIZED table after two successive incremental refreshes (a
# deterministic even/odd event_id split) must equal the one-shot
# aggregate the oracle computes — count/sum partials are decomposable,
# so the merge path (existing-partition read + delta union +
# re-aggregate + dynamic partition overwrite) is exact regardless of
# how events are batched. Hash-checks the INCREMENTAL code path the
# streaming rollup sink reuses per micro-batch; the serving-shape
# query above checks only the aggregation semantics.
@register("rollup_incremental_vs_full", DAILY_ROLLUP_ORACLE)
def rollup_incremental_vs_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tfm_semisup_spark.operators.rollup_table import (
        incremental_refresh,
        read_rollup,
    )

    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="tfm_rollup_inc_")
    path = f"{base}/rollup"
    incremental_refresh(spark, events.where(F.col("event_id") % 2 == 0), path)
    incremental_refresh(spark, events.where(F.col("event_id") % 2 == 1), path)
    return read_rollup(spark, path).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


@register("daily_rollup_by_type", DAILY_ROLLUP_ORACLE)
def daily_rollup_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# Sixth streaming-materialized tier: CDC LATEST-WINS MERGE — the
# foreachBatch upsert-apply pattern (streaming/events.py
# cdc_latest_wins_merge_stream). The source is re-laid-out into 4
# bucket files so maxFilesPerTrigger=1 yields a REAL multi-batch
# incremental run; the merge combine (max struct keyed by
# (ts, event_id)) is associative/commutative/idempotent, so the final
# state table is independent of file/batch order and of at-least-once
# replay — which is exactly why a plain per-user argmax over the whole
# event history is a valid oracle for it.
CDC_MERGE_ORACLE = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       ROUND(value, 2) AS last_value
FROM (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rk
  FROM events
)
WHERE rk = 1
"""


@register("streaming_cdc_merge_state", CDC_MERGE_ORACLE)
def streaming_cdc_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: events re-bucketed into 4 source files ->
    maxFilesPerTrigger=1 availableNow run -> per-batch latest-wins
    merge into a parquet state dir -> final state (user_id, last_ts,
    last_value)."""
    import tempfile

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.streaming.events import cdc_latest_wins_merge_stream

    base = tempfile.mkdtemp(prefix="tfm_stream_cdc_")
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    # 4 deterministic source files (one per user_id bucket)
    src = f"{base}/src"
    (
        events.repartition(4, F.pmod("user_id", F.lit(4)))
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    cdc_latest_wins_merge_stream(
        spark, src, f"{base}/state", f"{base}/ckpt", schema
    )
    return spark.read.parquet(f"{base}/state").select(
        "user_id",
        F.date_format("ts", TS_FMT).alias("last_ts"),
        F.round("value", 2).alias("last_value"),
    )


# Seventh streaming-materialized tier: the CONTINUOUS-AGGREGATE SINK
# (streaming/events.py stream_rollup_sink -> operators/rollup_table.py
# incremental_refresh per micro-batch). Events are re-laid-out into 4
# bucket files so maxFilesPerTrigger=1 yields a REAL multi-batch
# incremental run: each micro-batch recomputes only its affected day
# partitions from (existing rollup rows UNION delta). Count/sum
# partials are decomposable and the refresh is idempotent per batch
# under the checkpoint's replay guarantee, so the materialized table
# converges to the one-shot aggregate regardless of how events are
# split across batches — which is exactly why the batch day-rollup SQL
# (DAILY_ROLLUP_ORACLE, shared with daily_rollup_by_type and
# rollup_incremental_vs_full) is a valid oracle for the stream sink.
@register("streaming_rollup_sink_state", DAILY_ROLLUP_ORACLE)
def streaming_rollup_sink_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hypertable maintenance: events re-bucketed into 4
    source files -> maxFilesPerTrigger=1 availableNow run -> per-batch
    incremental_refresh into a day-partitioned rollup dir -> serve
    (day, event_type, n, sum_value) from the materialized table."""
    import tempfile

    from tfm_semisup_spark.operators.rollup_table import read_rollup
    from tfm_semisup_spark.streaming.events import stream_rollup_sink

    base = tempfile.mkdtemp(prefix="tfm_stream_rollup_")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    src = f"{base}/src"
    (
        events.repartition(4, F.pmod("event_id", F.lit(4)))
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    query = stream_rollup_sink(stream, f"{base}/rollup", f"{base}/ckpt")
    query.awaitTermination()
    return read_rollup(spark, f"{base}/rollup").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


# Eighth streaming-materialized tier: the INGEST QUALITY GATE
# (streaming/quality.py stream_quality_filter). The Gopher/C4 rule
# chain is pure columnar expressions — no state, no watermark — so the
# stream emits each surviving doc exactly once in append mode and the
# artifact is deterministic. The oracle re-derives the same five rules
# in DuckDB (the expressions QUALITY_RULES_ORACLE already pins) and
# keeps only pass-all docs; sum(doc_id) pins the surviving SET, not
# just its size. Null/empty texts fail closed on both sides.
STREAMING_QUALITY_GATE_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
f AS (
  SELECT doc_id, source,
         len(w) AS n,
         list_avg(list_transform(w, x -> len(x))) AS mwl,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(w) AS alpha,
         len(list_distinct(w)) * 1.0 / len(w) AS ttr,
         len(list_distinct(list_filter(w, x -> x IN ('the', 'a')))) AS stop
  FROM t WHERE len(w) > 0
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM f
WHERE (n BETWEEN 20 AND 1000)
  AND (mwl >= 3.0 AND mwl <= 8.0)
  AND (alpha >= 0.8)
  AND (ttr >= 0.35)
  AND (stop >= 2)
GROUP BY source
"""


@register("streaming_quality_gate_stats", STREAMING_QUALITY_GATE_ORACLE)
def streaming_quality_gate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating AT ingest via a REAL micro-batch run: readStream
    over documents -> Gopher rule gate (identical expressions to the
    batch audit) -> append foreachBatch parquet artifact -> batch read
    + per-source survivor count and doc_id checksum. Output
    (source, n_docs, sum_doc_id)."""
    import tempfile

    from tfm_semisup_spark.streaming.events import materialize_stream_to_parquet
    from tfm_semisup_spark.streaming.quality import stream_quality_filter

    base = tempfile.mkdtemp(prefix="tfm_stream_quality_")
    docs_path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/documents.parque*")
    kept = stream_quality_filter(stream).select("doc_id", "source")
    materialize_stream_to_parquet(kept, f"{base}/out", f"{base}/ckpt")
    return (
        spark.read.parquet(f"{base}/out")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        )
    )


# Ninth streaming-materialized tier: stream-stream LEFT OUTER
# interval join — the null-completion semantics (an event with NO
# same-user follower within 5 minutes emits exactly one NULL-completed
# row when the watermark evicts it). Outer rows near the stream's end
# never finalize (the trailing no-data micro-batch only advances the
# watermark to max event time − delay), so BOTH sides clamp left rows
# to a horizon 15 minutes inside the final watermark — the
# finalized-window discipline of the session/sliding tiers. Counts are
# exact integers; matched pairs and unmatched singletons are counted
# from the same artifact rows.
STREAMING_LEFTOUTER_ORACLE = """
WITH wm AS (
  SELECT MAX(ts) - INTERVAL 2 HOURS - INTERVAL 15 MINUTES AS h FROM events
),
l AS (
  SELECT user_id, event_id, ts FROM events CROSS JOIN wm WHERE ts <= wm.h
),
j AS (
  SELECT l.user_id, l.event_id, b.event_id AS r_event
  FROM l LEFT JOIN events b
    ON b.user_id = l.user_id
   AND b.ts > l.ts
   AND b.ts <= l.ts + INTERVAL 5 MINUTES
)
SELECT user_id,
       CAST(SUM(CASE WHEN r_event IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(SUM(CASE WHEN r_event IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched
FROM j
GROUP BY user_id
"""


@register("streaming_leftouter_join_finalized", STREAMING_LEFTOUTER_ORACLE)
def streaming_leftouter_join_finalized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join via a real micro-batch
    run: watermarked user-keyed join, append foreachBatch parquet
    artifact, batch read clamped to the finalization horizon. Output
    (user_id, n_pairs, n_unmatched) — unmatched rows are the
    null-completed evictions."""
    import tempfile

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.streaming.events import (
        interval_join_stream,
        materialize_stream_to_parquet,
        read_events_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_lojoin_")
    joined = interval_join_stream(
        read_events_stream(spark, sf_dir),
        read_events_stream(spark, sf_dir),
        interval="5 minutes",
        watermark="2 hours",
        how="leftOuter",
    ).select("l_user", "l_event", "r_event", "l_ts")
    materialize_stream_to_parquet(joined, f"{base}/out", f"{base}/ckpt")
    horizon = load_table(spark, sf_dir, "events").agg(
        (
            F.max("ts")
            - F.expr("INTERVAL 2 HOURS")
            - F.expr("INTERVAL 15 MINUTES")
        ).alias("h")
    )
    return (
        spark.read.parquet(f"{base}/out")
        .crossJoin(F.broadcast(horizon))
        .where(F.col("l_ts") <= F.col("h"))
        .groupBy(F.col("l_user").alias("user_id"))
        .agg(
            F.sum(
                F.when(F.col("r_event").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pairs"),
            F.sum(F.when(F.col("r_event").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unmatched"),
        )
    )


# Tenth streaming-materialized tier: stream-stream FULL OUTER interval
# join — BOTH null-completion directions (a left event with no
# follower within 5 minutes emits once with NULL right columns; a
# right event with no same-user predecessor in the 5 minutes before it
# emits once with NULL left columns — each at its state eviction).
# Horizon discipline: matched/left-outer rows clamp on l_ts, right-
# outer rows clamp on r_ts, both 15 minutes inside the final
# watermark. The right-unmatched oracle test runs NOT EXISTS against
# ALL events (not the horizon-clamped set): a matching left event
# beyond the horizon still matches in the stream — it only excludes
# the PAIR row from the clamped aggregate, not the match itself.
STREAMING_FULLOUTER_ORACLE = """
WITH wm AS (
  SELECT MAX(ts) - INTERVAL 2 HOURS - INTERVAL 15 MINUTES AS h FROM events
),
l AS (
  SELECT user_id, event_id, ts FROM events CROSS JOIN wm WHERE ts <= wm.h
),
lj AS (
  SELECT l.user_id, l.event_id, b.event_id AS r_event
  FROM l LEFT JOIN events b
    ON b.user_id = l.user_id
   AND b.ts > l.ts
   AND b.ts <= l.ts + INTERVAL 5 MINUTES
),
lagg AS (
  SELECT user_id,
         SUM(CASE WHEN r_event IS NOT NULL THEN 1 ELSE 0 END) AS n_pairs,
         SUM(CASE WHEN r_event IS NULL THEN 1 ELSE 0 END) AS n_left_unmatched
  FROM lj GROUP BY user_id
),
runm AS (
  SELECT r.user_id, COUNT(*) AS n_right_unmatched
  FROM events r CROSS JOIN wm
  WHERE r.ts <= wm.h
    AND NOT EXISTS (
      SELECT 1 FROM events b
      WHERE b.user_id = r.user_id
        AND b.ts < r.ts
        AND b.ts >= r.ts - INTERVAL 5 MINUTES
    )
  GROUP BY r.user_id
)
SELECT COALESCE(lagg.user_id, runm.user_id) AS user_id,
       CAST(COALESCE(lagg.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(lagg.n_left_unmatched, 0) AS BIGINT)
         AS n_left_unmatched,
       CAST(COALESCE(runm.n_right_unmatched, 0) AS BIGINT)
         AS n_right_unmatched
FROM lagg FULL OUTER JOIN runm ON lagg.user_id = runm.user_id
"""


@register("streaming_fullouter_join_finalized", STREAMING_FULLOUTER_ORACLE)
def streaming_fullouter_join_finalized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream FULL OUTER interval join via a real micro-batch
    run: (user_id, n_pairs, n_left_unmatched, n_right_unmatched) —
    both null-completion directions, each clamped to its own
    finalization horizon."""
    import tempfile

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.streaming.events import (
        interval_join_stream,
        materialize_stream_to_parquet,
        read_events_stream,
    )

    base = tempfile.mkdtemp(prefix="tfm_stream_fojoin_")
    joined = interval_join_stream(
        read_events_stream(spark, sf_dir),
        read_events_stream(spark, sf_dir),
        interval="5 minutes",
        watermark="2 hours",
        how="fullOuter",
    ).select("l_user", "l_event", "r_user", "r_event", "l_ts", "r_ts")
    materialize_stream_to_parquet(joined, f"{base}/out", f"{base}/ckpt")
    horizon = load_table(spark, sf_dir, "events").agg(
        (
            F.max("ts")
            - F.expr("INTERVAL 2 HOURS")
            - F.expr("INTERVAL 15 MINUTES")
        ).alias("h")
    )
    art = spark.read.parquet(f"{base}/out").crossJoin(F.broadcast(horizon))
    left_side = (
        art.where(F.col("l_event").isNotNull() & (F.col("l_ts") <= F.col("h")))
        .groupBy(F.col("l_user").alias("user_id"))
        .agg(
            F.sum(F.when(F.col("r_event").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs"),
            F.sum(F.when(F.col("r_event").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_left_unmatched"),
        )
    )
    right_side = (
        art.where(F.col("l_event").isNull() & (F.col("r_ts") <= F.col("h")))
        .groupBy(F.col("r_user").alias("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_right_unmatched"))
    )
    return (
        left_side.join(right_side, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_left_unmatched", F.lit(0))
            .cast("bigint")
            .alias("n_left_unmatched"),
            F.coalesce("n_right_unmatched", F.lit(0))
            .cast("bigint")
            .alias("n_right_unmatched"),
        )
    )
