"""Physical-plan inspection helpers — the engine's "is this the plan
I'd want at 100 TB?" toolkit (build brief: .explain('formatted') every
operator and iterate).

Used by tests/test_plans.py to LOCK IN plan properties: filters pushed
to the parquet scan, unused columns pruned, dimension joins broadcast,
no Python UDF in relational paths, bounded shuffle counts. A regression
that turns a broadcast join into a shuffle join, or blocks a filter
behind a UDF, fails CI here — not at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters predicate names across all scans in the plan
    (e.g. 'GreaterThan(l_quantity', 'In(l_returnflag'). Greedy to the
    last bracket per line — predicates like In(c, [A, R]) contain
    nested brackets."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (ReadSchema) —
    the column-pruning evidence."""
    text = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def forced_broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan
    (ResolvedHint nodes — present only when the query author forced the
    strategy with F.broadcast / a SQL hint; joins whose broadcast was
    CHOSEN by size stats or AQE carry none).

    The 100 TB rule this backs: a hint on an SF-scaling side overrides
    Catalyst/AQE and turns a would-be sort-merge fallback into an OOM,
    so hints are reserved for fixed-cardinality sides."""
    analyzed = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — they move only the small side)."""
    text = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\s*$", text, re.MULTILINE))


def uses_python_udf(df: DataFrame) -> bool:
    text = explain_str(df)
    return any(tag in text for tag in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Distinct whole-stage-codegen spans (asterisk ids). Under AQE the
    codegen markers only exist in the FINAL plan, so by default the
    DataFrame is executed first (collect) and the executed plan
    inspected."""
    if execute:
        df.collect()
        text = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    else:
        text = explain_str(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", text)))
