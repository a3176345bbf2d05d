from team_02_spark.operators import dedup, relational, similarity  # noqa: F401
