"""team_02_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference pipeline
(Big-Data-Programming/Team_02, a pandas/sklearn tweet-sentiment batch
pipeline — see SURVEY.md) as a library of pure ``DataFrame -> DataFrame``
stage functions over vanilla PySpark, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
the reference lacks, each designed for 100 TB scale:

- no driver-side state or ``collect()`` loops in any operator,
- declarative Column expressions so Catalyst can push down / prune,
- broadcast hints for dimension tables, AQE on by default,
- Python crossed only via Arrow-batched ``pandas_udf`` where a JVM
  builtin genuinely cannot express the semantics.
"""

from team_02_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
