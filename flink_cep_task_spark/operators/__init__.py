from flink_cep_task_spark.operators.fanout import fanout_rules  # noqa: F401
from flink_cep_task_spark.operators.windows import evaluate_windows  # noqa: F401
