"""Event-time window assignment + aggregation + threshold gate (W1-W5, A1-A3).

Replaces the reference's WindowAssigner/Window/Trigger machinery
(TumblingWindowAssigner.java, SlidingWindowAssigner.java,
AllWindowAssigner.java, Window.java, TriggerCenter.java) with one
declarative pass.

Because rules are *data*, different rows carry different window sizes — so
instead of `F.window()` (whose duration is a literal), window assignment is
epoch arithmetic on columns:

  tumbling: start = floor(t / size) * size                    (one window)
  sliding:  starts = sequence(s0, s1, slide) with
            s0 = smallest aligned start > t - size, s1 = floor(t/slide)*slide
            (k = ceil(size/slide) covering windows — the same replication
            factor Flink's sliding assigner produces)
  global:   start = NULL (one unbounded window per group,
            AllWindowAssigner.java:23-30)

then ONE explode + ONE hash aggregation evaluates every rule of every type
simultaneously. All expressions are built-in (whole-stage codegen); the only
shuffle is the groupBy on (rule_id, group_id, window_start) — exactly the
reference's keyBy shuffle (CEPTaskRunner.java:46), with the window in the
key so state is naturally partitioned at 100 TB scale.

Windows are epoch-aligned [start, end) half-open (Window.java:66-68 is also
half-open). The reference aligns tumbling windows to each group's first
event (quirk Q3, TumblingWindowAssigner.java:27-39); we use epoch alignment
(the standard Spark/Flink-SQL semantic). A first-event-aligned compat mode
lives in streaming/state.py.

Aggregate semantics are SQL (nulls ignored; AVG = sum/count over the
window): deliberate fixes of reference quirks Q1 (SUM/MAX seeded with ZERO)
and Q2 (AVG divisor uses the whole shared buffer, Window.java:85). Each
divergence is pinned by a test in tests/test_windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SECONDS_PER_MINUTE = 60


def assign_windows(fanned: DataFrame, ts_col: str = "event_time") -> DataFrame:
    """Explode each rule-stamped metric row into its covering window(s).

    Adds `window_start` / `window_end` (epoch seconds, NULL for global
    windows). Pure column arithmetic — supports heterogeneous window specs
    in a single plan.
    """
    t = F.col(ts_col).cast("long")  # epoch seconds, truncated
    size = (F.col("window_minutes").cast("long") * SECONDS_PER_MINUTE).alias("size_s")
    slide = (
        F.coalesce(F.col("window_slide_minutes"), F.col("window_minutes")).cast("long")
        * SECONDS_PER_MINUTE
    )

    tumb_start = F.floor(t / size) * size
    # smallest aligned start strictly greater than t - size ⇒ the window
    # [s, s+size) still contains t; largest aligned start ≤ t.
    slide_first = (F.floor((t - size) / slide) + F.lit(1)) * slide
    slide_last = F.floor(t / slide) * slide
    starts = (
        F.when(F.col("window_type") == "tumbling", F.array(tumb_start))
        .when(
            F.col("window_type") == "sliding",
            F.when(slide_first <= slide_last, F.sequence(slide_first, slide_last, slide))
            .otherwise(F.array().cast("array<long>")),  # slide > size ⇒ gaps
        )
        .otherwise(F.array(F.lit(None).cast("long")))  # global window
    )
    out = fanned.withColumn("window_start", F.explode(starts))
    return out.withColumn(
        "window_end",
        F.when(F.col("window_start").isNotNull(), F.col("window_start") + size),
    )


def aggregate_windows(assigned: DataFrame) -> DataFrame:
    """One hash aggregation computing all four aggregate kinds, then a CASE
    projection picks each rule's requested one (Window.java:40-47 dispatch).

    Catalyst runs this as partial (map-side) + final aggregation — the
    incremental-fold behavior of the reference (Window.java:98-126) falls
    out of the standard SUM/MIN/MAX/COUNT accumulators, and AVG becomes
    (exact decimal SUM, COUNT) instead of the reference's buffered TreeMap
    (strictly better: O(1) state per window, no raw-row retention).
    """
    agg = assigned.groupBy(
        "rule_id",
        "group_id",
        "window_start",
        "window_end",
        # functionally dependent on rule_id — kept in the key to ride along
        # without a second join; adds no cardinality.
        "agg_type",
        "limit_op",
        "limit",
    ).agg(
        F.sum("agg_input").alias("__sum"),
        F.count("agg_input").alias("__cnt"),
        F.min("agg_input").alias("__min"),
        F.max("agg_input").alias("__max"),
    )
    value = (
        F.when(F.col("agg_type") == "SUM", F.col("__sum").cast("double"))
        .when(F.col("agg_type") == "AVG", F.col("__sum").cast("double") / F.col("__cnt"))
        .when(F.col("agg_type") == "MIN", F.col("__min").cast("double"))
        .otherwise(F.col("__max").cast("double"))
    )
    return agg.withColumn("agg_value", value).drop("__sum", "__cnt", "__min", "__max")


def apply_threshold(aggregated: DataFrame) -> DataFrame:
    """HAVING gate: keep rows where `agg <op> limit` (A3).

    Mirrors Rule.apply's BigDecimal.compareTo switch (Rule.java:39-56) as a
    CASE over the six comparators. Comparison happens on the double
    aggregate vs. the decimal limit cast to double — deterministic because
    the aggregate itself is computed exactly (decimal) before the cast.
    """
    lim = F.col("limit").cast("double")
    v = F.col("agg_value")
    op = F.col("limit_op")
    passed = (
        F.when(op == "=", v == lim)
        .when(op == "!=", v != lim)
        .when(op == ">", v > lim)
        .when(op == ">=", v >= lim)
        .when(op == "<", v < lim)
        .otherwise(v <= lim)
    )
    return aggregated.filter(passed)


def evaluate_session_windows(fanned: DataFrame, round_digits: int = 4) -> DataFrame:
    """Gap-based session windows — an engine extension beyond the
    reference's tumbling/sliding/global triple (CEPEngine.java:75-81).

    `window_minutes` is the inactivity gap: events of a (rule, group) whose
    timestamps are less than `gap` apart merge into one session; the window
    closes at last_event + gap (Spark's native semantics). Uses
    `F.session_window` with a DYNAMIC per-row gap column, so rules with
    different gaps still evaluate in one pass — one shuffle keyed by
    (rule_id, group_id), state merged by Spark's session-merge exec, no
    per-rule driver loop.

    Event time is truncated to whole epoch seconds BEFORE sessionization
    (the same seconds resolution the rest of the engine uses for window
    arithmetic), which keeps session bounds integral and the oracle's
    lag/cumsum island reconstruction bit-exact.
    """
    gap_s = F.col("window_minutes").cast("long") * SECONDS_PER_MINUTE
    sec_ts = F.timestamp_seconds(F.col("event_time").cast("long"))
    w = fanned.withColumn("__ts", sec_ts).groupBy(
        "rule_id",
        "group_id",
        F.session_window(F.col("__ts"), F.concat(gap_s.cast("string"), F.lit(" seconds"))).alias("__w"),
        "agg_type",
        "limit_op",
        "limit",
    ).agg(
        F.sum("agg_input").alias("__sum"),
        F.count("agg_input").alias("__cnt"),
        F.min("agg_input").alias("__min"),
        F.max("agg_input").alias("__max"),
    )
    value = (
        F.when(F.col("agg_type") == "SUM", F.col("__sum").cast("double"))
        .when(F.col("agg_type") == "AVG", F.col("__sum").cast("double") / F.col("__cnt"))
        .when(F.col("agg_type") == "MIN", F.col("__min").cast("double"))
        .otherwise(F.col("__max").cast("double"))
    )
    gated = apply_threshold(w.withColumn("agg_value", value))
    return gated.select(
        "rule_id",
        "group_id",
        F.col("__w.start").cast("long").alias("window_start"),
        F.col("__w.end").cast("long").alias("window_end"),
        "agg_type",
        round_half_up("agg_value", round_digits).alias("agg_value"),
    )


def round_half_up(col, digits: int = 4):
    """floor(x·10^d + 0.5)/10^d — the ONE rounding formula every engine
    surface (batch, live streaming, DuckDB oracle) applies to agg_value.

    F.round (JVM BigDecimal HALF_UP on the double's shortest decimal
    repr) and DuckDB's round() (scaled-multiply on the raw binary double)
    disagree when x·10^d lands within one ulp of a half — e.g. an AVG of
    exact cents whose double quotient prints as ...22.86125: Spark
    rounded it 22.8613, DuckDB 22.8612 (found by cep_many_rules at
    sf0.01). The floor form is pure double arithmetic — multiply, add,
    floor — reproducible bit-for-bit in Spark, Python, and DuckDB since
    the unrounded agg_value is itself identical (exact decimal sums /
    integer counts)."""
    scale = F.lit(float(10 ** digits))
    return (F.floor(F.col(col) * scale + F.lit(0.5)) / scale).cast("double")


def evaluate_windows(fanned: DataFrame, round_digits: int = 4) -> DataFrame:
    """Full W+A pipeline: assign → aggregate → threshold → enriched output.

    Output (Q9 enrichment — the reference emits only the bare aggregate
    value, Window.java:58-63; we emit full context):
      rule_id INT, group_id STRING, window_start BIGINT, window_end BIGINT,
      agg_type STRING, agg_value DOUBLE (rounded for cross-engine hashing).
    """
    gated = apply_threshold(aggregate_windows(assign_windows(fanned)))
    return gated.select(
        "rule_id",
        "group_id",
        "window_start",
        "window_end",
        "agg_type",
        round_half_up("agg_value", round_digits).alias("agg_value"),
    )
