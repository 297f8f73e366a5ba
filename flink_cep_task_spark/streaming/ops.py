"""Streaming-native operators beyond the CEP core: session windows and
within-watermark deduplication — the Structured Streaming twins of the
batch `sessionize_events` / `dedup_exact` plans.

The reference has no session windows or dedup (SURVEY.md §2 "operators the
reference does NOT have"); these are north-star additions mapped to the
built-in primitives:

  * F.session_window — gap-merged event-time sessions; streaming state is
    per (user, open session), evicted when the watermark passes a session's
    end. Batch and streaming share the SAME plan shape, so results agree.
  * dropDuplicatesWithinWatermark — keyed first-wins dedup whose state is
    bounded by the watermark delay (the 100 TB-safe form of streaming
    exact dedup: state holds only keys younger than the delay, instead of
    every key ever seen).

All event times are truncated to whole seconds before sessionizing so the
gap comparison is integer arithmetic — identical in Spark and the DuckDB
gaps-and-islands oracle (sub-second timestamps would make the two engines
split sessions differently at exact-gap boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_task_spark.operators.dedup import _norm

SESSION_GAP = "30 minutes"
SESSION_GAP_S = 1800


def session_window_agg_df(
    events: DataFrame,
    ts_col: str = "ts_sec",
    user_col: str = "user_id",
    gap: str = SESSION_GAP,
) -> DataFrame:
    """Gap-merged sessions via the native F.session_window — one plan for
    batch AND streaming input (streaming needs a watermark upstream).

    Output: user_id, session_start (first event, epoch s), session_end
    (last event + gap, epoch s), n_events.
    """
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
        )
    )


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch driver query over `events` (oracle: gaps-and-islands SQL).

    F.session_window merges an event into the current session iff its
    timestamp is strictly before the session's end (= last event + gap),
    so a new session starts when the gap is >= 30 min — mirrored by the
    >= in the oracle's lag comparison."""
    from flink_cep_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.timestamp_seconds(F.col("ts").cast("long")).alias("ts_sec"),
    )
    return session_window_agg_df(ev)


SESSION_WINDOW_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
), flagged AS (
  SELECT user_id, event_id, ts_s,
    CASE WHEN lag(ts_s) OVER w IS NULL
           OR ts_s - lag(ts_s) OVER w >= {SESSION_GAP_S} THEN 1 ELSE 0 END AS new_s
  FROM ordered
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
), sessions AS (
  SELECT user_id, ts_s,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts_s) AS session_start,
       max(ts_s) + {SESSION_GAP_S} AS session_end,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "event_time",
    user_col: str = "user_id",
    gap: str = SESSION_GAP,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming session windows: append-mode, sessions emit when the
    watermark passes their end (state evicted then — bounded by the number
    of OPEN sessions, not history)."""
    trunc = events.select(
        F.col(user_col),
        F.timestamp_seconds(F.col(ts_col).cast("long")).alias("ts_sec"),
    ).withWatermark("ts_sec", watermark)
    return session_window_agg_df(trunc, ts_col="ts_sec", user_col=user_col, gap=gap)


def followed_by_stream(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "30 minutes",
    ts_col: str = "event_time",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """CEP 'A followed by B within T' on a LIVE stream: a stream-stream
    INNER join with watermarks on both sides and an event-time interval
    condition — Spark buffers each side's rows only until the watermark
    proves no more matches can arrive, so join state is bounded by
    (watermark delay + interval), not history. Batch twin:
    plans/analytics.followed_by_click_purchase."""
    from pyspark.sql.functions import expr

    a = (
        events.filter(F.col("event_type") == first_type)
        .select(
            F.col(user_col).alias("a_user"),
            F.col(ts_col).alias("a_time"),
        )
        .withWatermark("a_time", watermark)
    )
    b = (
        events.filter(F.col("event_type") == then_type)
        .select(
            F.col(user_col).alias("b_user"),
            F.col(ts_col).alias("b_time"),
        )
        .withWatermark("b_time", watermark)
    )
    return a.join(
        b,
        expr(
            f"a_user = b_user AND b_time > a_time "
            f"AND b_time <= a_time + interval {within}"
        ),
    ).select(
        F.col("a_user").alias(user_col),
        F.col("a_time").cast("long").alias("first_ts"),
        F.col("b_time").cast("long").alias("then_ts"),
    )


def followed_by_timeout_stream(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "30 minutes",
    ts_col: str = "event_time",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """CEP NEGATION / timeout pattern on a live stream: 'A *not* followed
    by B within T' — the abandoned-cart alert. Same interval-bounded
    stream-stream join as followed_by_stream but LEFT OUTER: a matched A
    emits with its B timestamps; an unmatched A emits with NULL then_ts,
    and only once the watermark proves no qualifying B can still arrive
    (Spark holds the unmatched row exactly until a_time + interval +
    watermark delay — the state bound is unchanged). The reference cannot
    express absence-of-an-event at all (its only trigger is an arriving
    metric); event-time timeout emission is the principled version."""
    from pyspark.sql.functions import expr

    a = (
        events.filter(F.col("event_type") == first_type)
        .select(F.col(user_col).alias("a_user"), F.col(ts_col).alias("a_time"))
        .withWatermark("a_time", watermark)
    )
    b = (
        events.filter(F.col("event_type") == then_type)
        .select(F.col(user_col).alias("b_user"), F.col(ts_col).alias("b_time"))
        .withWatermark("b_time", watermark)
    )
    return a.join(
        b,
        expr(
            f"a_user = b_user AND b_time > a_time "
            f"AND b_time <= a_time + interval {within}"
        ),
        "leftOuter",
    ).select(
        F.col("a_user").alias(user_col),
        F.col("a_time").cast("long").alias("first_ts"),
        F.col("b_time").cast("long").alias("then_ts"),
    )


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first document per normalized-text md5 key
    within the watermark horizon survives (dropDuplicatesWithinWatermark —
    state holds only keys younger than the delay; the batch twin is
    operators/dedup.dedup_exact). The key carries the batch family's
    NULL coalesce so a NULL-text doc gets the same canonical key in both
    engines (DEDUP_KEY_SQL's chr(0)||'null' sentinel)."""
    keyed = docs.withColumn(
        "k", F.md5(F.coalesce(_norm(F.col(text_col)), F.lit("\x00null")))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["k"])


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-STATIC enrichment: each streaming event joined against a
    static dimension snapshot — the most common production streaming join
    (fact stream + slowly-changing dim). The static side is broadcast
    (dims are KBs-MBs), so the stream never shuffles and no join state
    exists at all: unlike a stream-stream join there is nothing to buffer
    — each micro-batch probes the broadcast hash table and moves on. A
    left join keeps events whose key is missing from the dim (late dim
    arrival must not drop facts)."""
    return events.join(F.broadcast(dim), on=key, how="left")
