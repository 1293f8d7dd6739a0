from supplier_performance_data_pipeline_spark.sources.readers import (
    load_testdata,
    read_csv,
    read_parquet,
)
from supplier_performance_data_pipeline_spark.sources.writers import (
    write_parquet,
    write_table,
)

__all__ = [
    "load_testdata",
    "read_csv",
    "read_parquet",
    "write_parquet",
    "write_table",
]
