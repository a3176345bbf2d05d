from team_02_spark.sinks.writers import (
    dataset_fingerprint,
    write_csv,
    write_csv_content_addressed,
    write_mongodb,
    write_partitioned_parquet,
    write_predictions,
)

__all__ = [
    "dataset_fingerprint",
    "write_csv",
    "write_csv_content_addressed",
    "write_mongodb",
    "write_partitioned_parquet",
    "write_predictions",
]
