"""Local replica of the driver's DuckDB-oracle differential check:
row-count + column names + order-insensitive value comparison.

Stricter than it needs to be on purpose: values are compared exactly
(after dtype normalization), so anything that passes here should pass
any reasonable hashing scheme the driver uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all
    columns — the canonical order-insensitive form."""
    out = df.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif s.dtype == object:
            # dates / decimals / arrays → canonical string
            out[c] = s.map(lambda v: None if v is None else str(v))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def _kind(dtype) -> str:
    """Collapse a dtype to a hash-relevant kind: DuckDB renders HUGEINT
    sums as float64 in pandas (5 -> 5.0) while Spark returns int64; a
    typed value-hasher (the driver's) sees those as different even
    though ``5 == 5.0`` — the exact mechanism behind the r3 red rows
    (CORRECTNESS_r03: q_dup_rate_by_source, q_cv_agreement)."""
    k = getattr(dtype, "kind", "O")
    return {"u": "i"}.get(k, k)


def kind_mismatches(sp_raw: pd.DataFrame, du_raw: pd.DataFrame) -> list[str]:
    """int-vs-float kind drift between engines, pre-normalization."""
    problems = []
    common = set(sp_raw.columns) & set(du_raw.columns)
    for c in sorted(common):
        a, b = _kind(sp_raw[c].dtype), _kind(du_raw[c].dtype)
        if {a, b} == {"i", "f"}:
            problems.append(
                f"column {c!r}: dtype kind drift spark={sp_raw[c].dtype} "
                f"duck={du_raw[c].dtype} (driver hash hazard: un-cast "
                f"HUGEINT aggregate? wrap the oracle in CAST(... AS BIGINT))"
            )
    return problems


def compare(spark_df, duck_df: pd.DataFrame, *, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    sp_raw = spark_df.toPandas()
    problems: list[str] = kind_mismatches(sp_raw, duck_df)
    sp = normalize(sp_raw)
    du = normalize(duck_df)
    if list(sp.columns) != list(du.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duck={len(du)}")
        return problems
    for c in sp.columns:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            both_nan = a.isna() & b.isna()
            if float_tol:
                ok = both_nan | (np.abs(a - b) <= float_tol)
            else:
                ok = both_nan | (a == b)
        else:
            ok = (a.isna() & b.isna()) | (a == b)
        if not ok.all():
            bad = (~ok).idxmax()
            problems.append(
                f"column {c!r}: first mismatch at row {bad}: "
                f"spark={a.iloc[bad]!r} duck={b.iloc[bad]!r} "
                f"({int((~ok).sum())} rows differ)"
            )
    return problems
