"""JSON-line metric/rule parsing — the engine's schemaless ingest path.

Reference semantics (CEPTaskRunner.java:59-72): each line is a JSON object;
key "eventTime" is epoch millis; keys carrying the tag marker are string
tags; every other key is an integer measure; a line that fails to parse
becomes null and is filtered out (P1/P2 in SURVEY.md §2).

Spark-first design: the whole transform is built-in expressions — two
`from_json` passes into MapType plus `map_filter` — no Python UDF. Works
identically on batch DataFrames and streaming DataFrames (socket/kafka
`value` column).

Divergence (Q7, documented): the reference tags any key *containing* the
substring "t_" (so "host_name" would be a tag); we use the saner
startswith("t_") prefix test. Measures accept any numeric, not only ints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_cep_task_spark.schemas import MEASURE_DECIMAL

TAG_PREFIX = "t_"
EVENT_TIME_KEY = "eventTime"


def parse_metric_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a DataFrame of JSON lines into Metric rows.

    Output schema: event_time TIMESTAMP, tags MAP<STRING,STRING>,
    metrics MAP<STRING,DECIMAL(18,2)>. Unparseable lines are dropped
    (PERMISSIVE from_json yields null maps → filtered), matching the
    reference's parse-error→null→filter pipeline (CEPTaskRunner.java:33-34).
    """
    # Materialize the parsed map ONCE in its own projection: downstream
    # expressions reference the column, not four copies of from_json —
    # guaranteeing a single parse per row instead of leaning on Catalyst
    # subexpression elimination.
    parsed = lines.select(F.from_json(F.col(value_col), "map<string,string>").alias("__m"))
    as_map = F.col("__m")
    tags = F.map_filter(as_map, lambda k, _: k.startswith(TAG_PREFIX))
    # try_cast everywhere: under ANSI SQL (Spark 4 default) a plain cast
    # THROWS on malformed input; the reference's contract is bad-value →
    # null → dropped (CEPTaskRunner.java:68-70).
    measures = F.map_filter(
        as_map,
        lambda k, v: (~k.startswith(TAG_PREFIX))
        & (k != EVENT_TIME_KEY)
        & v.try_cast(MEASURE_DECIMAL).isNotNull(),
    )
    metrics = F.transform_values(measures, lambda _, v: v.try_cast(MEASURE_DECIMAL))
    event_time = F.timestamp_millis(
        F.try_element_at(as_map, F.lit(EVENT_TIME_KEY)).try_cast("long")
    )
    # The bad-line DROP is a Generate (explode of a 0/1-element array), NOT
    # a Filter: Catalyst pushes a deterministic Filter below any upstream
    # round-robin repartition, substituting the aliases — which re-inlines
    # the whole serialize+parse chain into the narrow pre-exchange segment
    # of the plan (measured: the entire parse ran in ONE task below the
    # widening exchange, twice). Pushdown cannot cross a Generate, so the
    # single parse stays above the exchange where it parallelizes.
    row = F.struct(
        event_time.alias("event_time"), tags.alias("tags"), metrics.alias("metrics")
    )
    kept = F.filter(
        F.array(row),
        lambda r: r.getField("event_time").isNotNull()
        & (F.size(r.getField("tags")) + F.size(r.getField("metrics")) > 0),
    )
    return parsed.select(F.explode(kept).alias("__r")).select(
        F.col("__r.event_time").alias("event_time"),
        F.col("__r.tags").alias("tags"),
        F.col("__r.metrics").alias("metrics"),
    )


def metric_to_json(event_time: Column, tags: Column, metrics: Column) -> Column:
    """Inverse bridge (testing aid): Metric row → reference-format JSON line."""
    merged = F.map_concat(
        F.create_map(F.lit(EVENT_TIME_KEY), (event_time.cast("double") * 1000).cast("long").cast("string")),
        tags,
        F.transform_values(metrics, lambda _, v: v.cast("string")),
    )
    return F.to_json(merged)
