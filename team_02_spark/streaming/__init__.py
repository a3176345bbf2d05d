from team_02_spark.streaming import windows  # noqa: F401
