"""Skew-resilient join — salting for hot keys (SURVEY.md scale
posture; complements q_key_skew's heavy-hitter profiler).

AQE's skew-join splitting (enabled in our session factory) handles
most skew at runtime by splitting oversized SMJ partitions; salting is
the explicit, planner-independent form for the pathological case —
one key holding a double-digit percentage of a 100 TB fact table,
where even a split partition's *single key group* exceeds an
executor. The transform is exact: each fact row carries one of
``salt`` random tags, the dimension side is replicated once per tag,
and the equi-join keys gain the tag — every fact row still meets
exactly one replica of each matching dimension row, so the output
multiset is identical to the plain join while the hot key's rows
spread over ``salt`` shuffle partitions.

Cost model: dimension side is replicated ``salt``× (choose salt ~
hot-key-rows / target-partition-rows, not thousands); fact side gains
one narrow int column. Worth it only when the dimension is much
smaller than the fact — which is exactly the skewed-join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str] | str,
                *, how: str = "inner", salt: int = 8,
                seed: int = 42) -> DataFrame:
    """Exact equi-join with the fact side salted ``salt`` ways.

    ``how`` is restricted to joins that preserve the fact side
    ('inner', 'left'/'left_outer', 'left_semi', 'left_anti'):
    dimension-preserving joins would multiply unmatched dimension
    rows by ``salt``.
    The salt is seeded-random per fact row — it only routes rows to
    shuffle partitions and is dropped before returning, so results
    are unaffected by the draw."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed) * salt).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_fact.join(replicated_dim, keys + ["__salt"], how)
    return out.drop("__salt")
