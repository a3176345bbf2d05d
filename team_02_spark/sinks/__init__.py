from team_02_spark.sinks.writers import (
    compact_parquet,
    dataset_fingerprint,
    write_csv,
    write_csv_content_addressed,
    write_mongodb,
    write_partitioned_parquet,
    write_predictions,
)

__all__ = [
    "compact_parquet",
    "dataset_fingerprint",
    "write_csv",
    "write_csv_content_addressed",
    "write_mongodb",
    "write_partitioned_parquet",
    "write_predictions",
]
