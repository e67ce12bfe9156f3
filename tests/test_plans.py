"""Physical-plan audits: the scale claims, machine-checked.

Each operator's docstring promises a plan shape (filter pushdown,
column pruning, broadcast small side, partial aggregation, no
cartesian product). These tests pin those properties so a refactor
that silently degrades the plan — the kind of regression only visible
at 100× the data — fails CI at sf0.001.
"""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_SMOKE


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _q(name):
    from energydatalake_spark.plans.registry import QUERIES

    return QUERIES[name].build


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_str(_q("decimal_cast")(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    assert "LessThan(l_orderkey" in plan


def test_column_pruning_on_wide_table(spark):
    # avg_by_month touches only l_shipdate + l_quantity of 16 columns;
    # the parquet ReadSchema must not include any price column.
    plan = plan_str(_q("avg_by_month")(spark, SF_SMOKE))
    assert "l_extendedprice" not in plan
    assert "l_comment" not in plan


def test_partial_aggregation_and_codegen(spark):
    # Grouped agg must be map-side partial + final (two HashAggregate
    # nodes with partial_sum below the exchange): the shuffle carries 4
    # group rows per partition, not 600k data rows.
    plan = plan_str(_q("pricing_summary")(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    # one shuffle for the aggregation + one for the final orderBy, none other
    assert plan.count("Exchange (") <= 2  # agg shuffle + orderBy range partitioning


def test_similarity_broadcasts_query_side(spark):
    plan = plan_str(_q("similarity_topk")(spark, SF_SMOKE))
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_band_join_is_equi_not_cartesian(spark):
    plan = plan_str(_q("band_join")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_asof_join_no_cartesian(spark):
    plan = plan_str(_q("asof_join")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_exact_single_shuffle_of_hashes(spark):
    # Exact dedup must be one shuffle keyed on the md5 (48-byte rows),
    # with partial aggregation below it — never a shuffle of document
    # bodies, never a second exchange.
    plan = plan_str(_q("dedup_exact")(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 1
    assert "partial_min" in plan or "partial_count" in plan
    assert "hashpartitioning(text_md5" in plan


def test_multiway_join_broadcasts_dimensions(spark):
    plan = plan_str(_q("revenue_by_nation")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sessionize_single_shuffle(spark):
    # windows (lag, running sum) and the final (key, sid) aggregate all
    # reuse one hash partitioning on the entity key
    plan = plan_str(_q("sessionize")(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 1
    assert "CartesianProduct" not in plan


def test_outer_join_is_sort_merge(spark):
    plan = plan_str(_q("outer_join")(spark, SF_SMOKE))
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "CartesianProduct" not in plan


def test_corpus_prep_no_cartesian(spark):
    plan = plan_str(_q("corpus_prep")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
