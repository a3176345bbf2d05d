from team_02_spark.ml import embed, models, scoring, tokenize  # noqa: F401
