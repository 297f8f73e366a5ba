"""Batch parquet sources for the driver's test tables (TESTDATA.md).

Handles the one env-specific wrinkle: the `events` table stores
TIMESTAMP(NANOS) which Spark's parquet reader only accepts as LONG
(spark.sql.legacy.parquet.nanosAsLong=true, set in session.py); we convert
nanos → TimestampType (microsecond truncation, matching how a
microsecond-precision engine reads the same file).

Also provides the typed→schemaless bridge `events_to_metrics`: the driver's
fixed-schema `events` table re-expressed as the engine's native Metric shape
(event_time, tags MAP, metrics MAP) — reference Metric.java:10-23 and the
`t_` tag convention of CEPTaskRunner.java:59-72.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_task_spark.schemas import MEASURE_DECIMAL

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalizes the events timestamp column.

    The driver has shipped `events.ts` as TIMESTAMP(NANOS) (read as raw
    nanos bigint under nanosAsLong) and as TIMESTAMP(MICROS, no tz) (read
    as TIMESTAMP_NTZ in Spark 4). Both are normalized to a session-tz-
    independent TimestampType instant: naive wall time is interpreted as
    UTC, exactly how DuckDB's epoch_ms() reads the same file — so epoch
    arithmetic downstream matches the oracle no matter the session tz.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos → micros; integer division keeps this exact.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Genuinely session-tz-free: micros since the NTZ epoch is pure
            # calendar arithmetic (no implicit NTZ→LTZ cast anywhere), then
            # timestamp_micros re-tags those micros as a UTC instant. The
            # tempting to_utc_timestamp(ntz,'UTC') is NOT tz-free — Spark
            # implicitly casts NTZ→TIMESTAMP through the session timezone
            # first (verified: +18000 s shift under America/New_York).
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND, "
                        "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                    )
                ),
            )
    # explicit provenance for file-keyed caches downstream (see
    # operators/cache.py copy_provenance: inputFiles() is unreliable once
    # a canonically-equal plan is persisted anywhere in the session)
    df._graft_input_files = (f"{sf_dir}/{name}.parquet",)
    return df


def _events_raw_bounded(
    spark: SparkSession,
    sf_dir: str,
    lower_inclusive_s: int | None = None,
    upper_exclusive_s: int | None = None,
) -> DataFrame:
    """Shared core of the three time-pruned event loaders: apply the
    given epoch-second bounds to the RAW parquet ts column BEFORE the
    normalization — so they reach the reader as pushed row-group
    filters. A predicate on load_table's derived instant column can
    never push (the NTZ→instant conversion wraps the scan column in an
    expression), and at 100 TB the pushdown IS the query: a bounded
    read should touch only row groups inside the window. Exact for
    both physical encodings (nanos bigint and TIMESTAMP_NTZ — the
    normalization re-tags the same instant, so raw-column order equals
    normalized order). One implementation, so an encoding change can
    never drift between the before/since/between variants."""
    import datetime as _dt

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        def raw(s: int):
            return F.lit(s * 1_000_000_000)

        norm = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        def raw(s: int):
            wall = _dt.datetime.fromtimestamp(s, _dt.timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            return F.lit(wall).cast("timestamp_ntz")

        norm = F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            )
        )
    if lower_inclusive_s is not None:
        df = df.filter(F.col("ts") >= raw(lower_inclusive_s))
    if upper_exclusive_s is not None:
        df = df.filter(F.col("ts") < raw(upper_exclusive_s))
    df = df.withColumn("ts", norm)
    df._graft_input_files = (f"{sf_dir}/events.parquet",)
    return df


def load_events_before(
    spark: SparkSession, sf_dir: str, upper_exclusive_s: int
) -> DataFrame:
    """Events with ts strictly before `upper_exclusive_s` (epoch
    seconds) — a point-in-time read that touches only row groups whose
    min ts precedes the cutoff (see _events_raw_bounded)."""
    return _events_raw_bounded(spark, sf_dir, upper_exclusive_s=upper_exclusive_s)


def load_events_since(
    spark: SparkSession, sf_dir: str, lower_inclusive_s: int
) -> DataFrame:
    """Events with ts at or after `lower_inclusive_s` (epoch seconds) —
    the mirror of load_events_before, for incremental pipelines whose
    'today's batch' is the tail of the table (see _events_raw_bounded)."""
    return _events_raw_bounded(spark, sf_dir, lower_inclusive_s=lower_inclusive_s)


def load_events_between(
    spark: SparkSession, sf_dir: str, lower_inclusive_s: int,
    upper_exclusive_s: int,
) -> DataFrame:
    """Events with ts in [lower_inclusive_s, upper_exclusive_s) — one
    bounded day/window slice whose batch read touches only that day's
    row groups (see _events_raw_bounded)."""
    return _events_raw_bounded(
        spark, sf_dir, lower_inclusive_s=lower_inclusive_s,
        upper_exclusive_s=upper_exclusive_s,
    )


def widen_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition an under-parallel scan BEFORE per-row-expensive work.

    The driver's test tables are single parquet files with ONE row group,
    so Spark's byte-range splitting cannot parallelize them: every
    scan-side pipeline (Arrow UDFs, the CEP fan-out up to its first
    shuffle) would otherwise run in a single task regardless of cores.
    This is a no-op whenever the source already yields enough partitions —
    the normal case at scale, where a 100 TB corpus arrives as thousands
    of splittable files and an unconditional repartition here would insert
    a corpus-wide shuffle. Apply it UNDER projections/UDFs (widen the raw
    scan, then build the plan) so the expensive expressions run above the
    exchange."""
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(target, 8):
        return df
    from flink_cep_task_spark.operators.cache import copy_provenance

    out = copy_provenance(df.repartition(target), df)
    # record the widen target so broadcast_gate.scan_partition_bound
    # stays a sound UPPER bound even for an explicit target above the
    # session parallelism (the raw-splits/parallelism max alone would
    # under-count such a frame's partitions and could let a gated
    # candidate set broadcast past the configured gate)
    out._graft_widen_target = max(
        target, getattr(df, "_graft_widen_target", 0)
    )
    return out


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register all test tables as temp views (mirrors the oracle's setup)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_to_metrics(events: DataFrame) -> DataFrame:
    """Typed events table → schemaless Metric rows (parity bridge).

    Tag/measure mapping (documented contract, used by oracle SQL too):
      tags:    t_event_type ← event_type, t_user ← CAST(user_id AS STRING)
      metrics: value ← value, k ← props JSON field "k"
    The `t_` prefix follows the reference's tag naming convention
    (CEPTaskRunner.java:66 uses a `t_` substring test; we use the same
    prefix spelling, divergence Q7 documented in SURVEY.md §2.1).
    """
    return events.select(
        F.col("ts").alias("event_time"),
        F.create_map(
            F.lit("t_event_type"), F.col("event_type"),
            F.lit("t_user"), F.col("user_id").cast("string"),
        ).alias("tags"),
        F.create_map(
            F.lit("value"), F.col("value").cast(MEASURE_DECIMAL),
            F.lit("k"), F.get_json_object("props", "$.k").cast(MEASURE_DECIMAL),
        ).alias("metrics"),
    )
