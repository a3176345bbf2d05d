from team_02_spark.functions import text, vectors  # noqa: F401
