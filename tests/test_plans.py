"""Plan-quality regression tests — lock in the physical-plan
properties that make queries survive a 100× scale-up (build brief:
pushdown, pruning, broadcast, no Python in relational hot paths,
bounded shuffles). A change that silently degrades a plan fails here.
"""

from __future__ import annotations

import pytest

from team_02_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    uses_python_udf,
    wholestage_codegen_spans,
)
from team_02_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return QUERIES[name].fn(spark, SF_SMOKE)


def test_filter_pushdown_reaches_scan(spark):
    df = _q(spark, "q_filter_compound")
    pushed = " ".join(pushed_filters(df))
    assert "GreaterThan(l_quantity" in pushed
    assert "In(l_returnflag" in pushed
    assert "GreaterThanOrEqual(l_discount" in pushed


def test_column_pruning_reaches_scan(spark):
    # projection of 4 of 5 columns → scan must not read `text` (the
    # wide column) at all
    schemas = read_schema_columns(_q(spark, "q_project"))
    assert schemas and all("text" not in cols for cols in schemas)
    # flagship reads ONLY text
    schemas = read_schema_columns(_q(spark, "q_token_topk"))
    assert schemas == [["text"]]


def test_dim_joins_are_broadcast(spark):
    for name in ("q_join_inner", "q_join_multi", "q_knn_topk", "q_join_range"):
        assert has_broadcast_join(_q(spark, name)), f"{name} lost its broadcast"


def test_join_multi_is_single_fact_pass(spark):
    # 3-way join with both dims broadcast: the only shuffle is the
    # final 5-group aggregation
    df = _q(spark, "q_join_multi")
    assert shuffle_count(df) <= 1


def test_no_python_udf_in_relational_paths(spark):
    for name in (
        "q_groupby_agg", "q_join_multi", "q_window_rank", "q_topk",
        "q_token_topk", "q_clean_text", "q_dedup_ngram", "q_knn_topk",
        "q_lang_id", "q_quality_score", "q_token_count",
    ):
        assert not uses_python_udf(_q(spark, name)), f"{name} crossed into Python"


def test_python_only_where_declared(spark):
    # the stemmer and embedder SHOULD be (Arrow-batched) Python stages
    assert uses_python_udf(_q(spark, "q_clean_stem"))
    assert uses_python_udf(_q(spark, "q_embed"))
    assert uses_python_udf(_q(spark, "q_multimodal_features"))


def test_wholestage_codegen_active(spark):
    for name in ("q_groupby_agg", "q_join_multi", "q_filter_compound"):
        assert wholestage_codegen_spans(_q(spark, name)) >= 1, name


def test_topk_never_full_sorts(spark):
    from team_02_spark.plans import explain_str

    text = explain_str(_q(spark, "q_topk"), "simple")
    assert "TakeOrderedAndProject" in text  # heap top-k, not global sort


def test_partial_aggregation_before_shuffle(spark):
    from team_02_spark.plans import explain_str

    text = explain_str(_q(spark, "q_groupby_agg"))
    # map-side combine: partial_sum must appear below the Exchange
    assert "partial_sum" in text


def test_agg_single_shuffle(spark):
    assert shuffle_count(_q(spark, "q_groupby_agg")) == 1
    assert shuffle_count(_q(spark, "q_event_rates")) <= 2  # distinct adds one
