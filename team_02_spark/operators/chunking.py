"""Document chunking as a pure stage function — the overlapping
fixed-token windowing every context-window pipeline runs before
tokenize/embed (query twin: queries/llm_pipeline.q_chunk_text).

A single narrow transformation (tokenize once, explode the window
starts): no shuffle, no state — which is exactly why the SAME
function runs under `spark.read` and `spark.readStream` unchanged
(tests/test_streaming.py proves batch ≡ stream). At 100 TB this is a
free rider on the scan in batch, and a stateless map in a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", chunk_size: int = 20,
                    stride: int = 15) -> DataFrame:
    """Split each document into ``chunk_size``-token windows starting
    every ``stride`` tokens (overlap = chunk_size - stride; the final
    chunks may be shorter). Returns (id_col, chunk_id, chunk,
    n_chunk_tokens). Documents with zero tokens produce no rows."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    with_toks = df.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") >= 1
    )
    starts = F.sequence(F.lit(1), F.size("__toks"), F.lit(stride))
    return (
        with_toks.select(id_col, "__toks", F.explode(starts).alias("__start"))
        .select(
            id_col,
            F.floor((F.col("__start") - 1) / stride).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start"), chunk_size), " "
            ).alias("chunk"),
            F.least(
                F.lit(chunk_size), F.size("__toks") - F.col("__start") + 1
            ).cast("int").alias("n_chunk_tokens"),
        )
    )
