"""flink_cep_task_spark — a PySpark-native rule-driven analytics engine.

Re-expresses the query semantics of the reference Flink CEP engine
(lhyundeadsoul/flink-cep-task) as declarative Spark DataFrame plans:

* dynamic rules (ACTIVE/PAUSE/DELETE lifecycle) evaluated as data, in a
  single broadcast-join + windowed-aggregate plan per micro-batch/query
  (reference: PartitionEngine.java, CEPEngine.java),
* event-time tumbling / sliding / global windows with SUM/AVG/MIN/MAX and
  threshold (HAVING) gates (reference: Window.java, *WindowAssigner.java),
* Structured Streaming execution with watermarks replacing the reference's
  hand-rolled TriggerCenter (reference: TriggerCenter.java),
* plus large-scale data-pipeline operators the reference lacks: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity
  search, text analysis, and multimodal column plumbing.

Everything in the hot path is built-in Catalyst expressions (JVM-side,
whole-stage codegen); Python UDFs appear only where semantics require
(clearly marked, Arrow-batched).
"""

__version__ = "0.1.0"

from flink_cep_task_spark.session import get_spark  # noqa: F401
