from flink_cep_task_spark.sources.tables import (  # noqa: F401
    TABLES,
    events_to_metrics,
    load_table,
    register_views,
)
