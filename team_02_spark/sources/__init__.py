from team_02_spark.sources.registry import (
    TABLES,
    load_table,
    load_tables,
    read_sentiment140_csv,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "read_sentiment140_csv", "register_views"]
