"""Size-gated broadcast for vocabulary-bounded model/candidate tables.

Several operators join a BOUNDED-but-growing side onto a corpus-scale
stream: the NB classifier's vocab-sized weight table
(operators/text.nb_doc_scores, quality_nb_score_from_store) and the
heavy-hitter recount's candidate set (HH_COUNTERS × scan partitions).
At fixture scale these comfortably broadcast; at 100 TB a 10⁶-partition
scan or a copy-inflated vocabulary can outgrow the broadcast range, and
a static F.broadcast() hint is UNCONDITIONAL — AQE cannot override it,
so the plan would OOM the driver instead of degrading to a shuffled
join (the same defect class round 4 purged from the TPC-H plans, which
got away with simply deleting the hints because their dims carry
catalog stats; these sides are mid-plan aggregates whose size Spark
cannot estimate, so the engine measures and decides itself).

`gated_broadcast` is the lever the SCALING.md round-8 notes name: hint
the broadcast only while a MEASURED row count (or a sound static upper
bound) sits under the gate; past it, return the side unhinted so the
planner/AQE picks — candidate/vocab keys are uniform-hashed strings, so
the fallback shuffle is skew-free.

The gate is rows, not bytes, because every gated side is a short-string
key + a numeric column (≲50 B/row): the default 8M rows ≈ a few hundred
MB broadcast, the upper end of comfortable. Tests shrink the conf to
force the fallback and pin result identity across both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_ROWS_GATE_CONF = "spark.graft.broadcastRowsGate"
BROADCAST_ROWS_GATE_DEFAULT = 8_000_000


def broadcast_rows_gate(spark) -> int:
    return int(
        spark.conf.get(BROADCAST_ROWS_GATE_CONF, str(BROADCAST_ROWS_GATE_DEFAULT))
    )


def scan_partition_bound(df: DataFrame) -> int:
    """A sound UPPER bound on `df`'s partition count that never runs a
    job: the raw file scan's split count (re-derived from the
    provenance path sources/tables.load_table threads through — a pure
    planning read, no action) joined with the session parallelism.
    Calling .rdd.getNumPartitions() on the frame ITSELF is not an
    option once widen_small_scan's repartition sits below the caller —
    under AQE that finalizes the adaptive plan and executes the shuffle
    map stage, a whole extra scan+shuffle-write job just to read a
    count. widen_small_scan only ever repartitions UP to
    defaultParallelism, so max(raw splits, parallelism) dominates the
    widened frame's true partition count; for frames without provenance
    (test LocalRelations) the parallelism alone is the bound. A caller
    that widened with an EXPLICIT target above the parallelism is
    covered too: widen_small_scan records its target on the frame
    (_graft_widen_target, threaded by copy_provenance)."""
    spark = df.sparkSession
    bound = max(
        spark.sparkContext.defaultParallelism,
        getattr(df, "_graft_widen_target", 0),
    )
    files = getattr(df, "_graft_input_files", None)
    if files:
        bound = max(bound, spark.read.parquet(*files).rdd.getNumPartitions())
    return bound


def gated_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    """Hint `df` for broadcast iff `n_rows` — an exact count or a sound
    UPPER bound on its rows — is within the configured gate; otherwise
    return it unhinted (shuffled-join fallback). Callers pass a count
    they were going to pay for anyway (a persisted fit, a store scan's
    metadata count) or a static bound that costs no job at all."""
    if n_rows <= broadcast_rows_gate(df.sparkSession):
        return F.broadcast(df)
    return df
