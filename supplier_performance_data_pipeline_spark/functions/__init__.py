from supplier_performance_data_pipeline_spark.functions.scalar import (
    minmax_normalize,
    nullif_div,
    on_time_flag,
    round_doubles,
)

__all__ = ["minmax_normalize", "nullif_div", "on_time_flag", "round_doubles"]
