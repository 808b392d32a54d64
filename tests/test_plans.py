"""Physical-plan assertions: the *shape* of the plan is the scale
contract. Correctness tests prove the small-SF answer; these prove the
properties that keep the same query fast at 100 TB — filters reaching
the parquet scan, small dimensions broadcast instead of shuffled,
top-k compiled to TakeOrderedAndProject instead of a full sort, and
hot paths staying inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

import pytest

from dbcut_spark.queries import QUERIES


@pytest.fixture(autouse=True, scope="module")
def _uncached(spark):
    """Cached tables (e.g. the DSL property suite's persisted orders)
    replace parquet scans with InMemoryTableScan, hiding PushedFilters —
    plan-shape assertions need the real scan."""
    spark.catalog.clearCache()
    yield


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(spark, sf_dir, name: str) -> str:
    import contextlib
    import io

    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """orders_page root predicates must appear as PushedFilters in the
    parquet scan, not as a post-scan Filter only."""
    plan = formatted(spark, sf_dir, "orders_page__orders")
    assert "PushedFilters" in plan
    # the o_orderstatus equality is pushable and must be pushed
    assert "IsNotNull(o_orderstatus)" in plan or "EqualTo(o_orderstatus,O)" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    """topk_orders projects 4 of 6 order columns — the scan must read
    only those (ReadSchema pruned)."""
    plan = formatted(spark, sf_dir, "topk_orders")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert "o_orderpriority" not in read[0]
    assert "o_orderstatus" not in read[0]


def test_topk_is_take_ordered(spark, sf_dir):
    """orderBy().limit() must compile to TakeOrderedAndProject
    (per-partition heaps + driver merge), never a global sort."""
    plan = plan_of(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    """tpch_q5's nation/region/customer/supplier joins must be
    broadcast — only orders⋈lineitem may shuffle."""
    plan = plan_of(spark, sf_dir, "tpch_q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3


def test_semi_and_anti_join_strategies(spark, sf_dir):
    """Closure/insert-ignore primitives: semi and anti joins must stay
    semi/anti at the physical level (no row-widening inner join +
    dedup)."""
    assert "LeftSemi" in plan_of(spark, sf_dir, "semi_join_orders")
    assert "LeftAnti" in plan_of(spark, sf_dir, "anti_join_customers")


def test_no_python_udf_in_relational_paths(spark, sf_dir):
    """Everything except the explicitly-vectorized paths (LSH signature
    matmul, multimodal decode) must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython stages in the hot relational queries."""
    for name in [
        "tpch_q1",
        "tpch_q3",
        "tpch_q5_region_revenue",
        "closure_main__lineitem",
        "dedup_exact",
        "dedup_minhash_lsh",
        "lang_id",
        "text_quality",
        "ann_cosine_topk",
        "events_sessionize",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_wholestage_codegen_covers_agg(spark, sf_dir):
    """tpch_q1's scan→filter→partial-agg pipeline must be inside
    WholeStageCodegen."""
    df = QUERIES["tpch_q1"](spark, sf_dir)
    df.collect()  # AQE: codegen spans appear in the final executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen spans; scan→filter→partial
    # agg must share span *(1)
    assert "*(1) HashAggregate" in plan
    assert "*(1) Filter" in plan
    assert plan.count("HashAggregate") >= 2


def test_closure_frontier_broadcast_when_bounded(spark, sf_dir):
    """A bounded extraction root (limit set) makes every frontier key
    set small; child semi-joins must broadcast the frontier rather than
    shuffling the full child table."""
    plan = plan_of(spark, sf_dir, "closure_main__lineitem")
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["tpch_q1", "semi_join_orders"])
def test_partial_aggregation_present(spark, sf_dir, name):
    """groupBy aggregates must do map-side partial aggregation (two
    HashAggregate levels) so the shuffle carries one row per
    (partition, key), not per input row."""
    plan = plan_of(spark, sf_dir, name)
    assert plan.count("HashAggregate") >= 2


def test_lsh_ann_shuffles_ids_only(spark, sf_dir):
    """The LSH ANN plan must never shuffle embedding vectors: the band
    join builds/broadcasts (id, band) rows only, and the pair dedup
    shuffles bare (query_id, cand_id) with map-side partial dedup.
    Vectors re-enter via joins after the dedup (ReusedExchange serves
    the second candidate read)."""
    df = QUERIES["ann_lsh_topk"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # band join is broadcast — no shuffle keyed on band columns
    assert "hashpartitioning(band" not in plan
    # pair dedup shuffles id-only rows, with a partial dedup before the
    # exchange (two HashAggregate levels whose output is just the ids)
    assert plan.count("HashAggregate(keys=[query_id") >= 2
    import re

    dedup_outputs = re.findall(r"HashAggregate\(keys=\[query_id[^\n]*output=\[([^\]]*)\]", plan)
    assert dedup_outputs and all("vec" not in out for out in dedup_outputs)
    # top-k is a group-limit (per-partition heaps), not a full sort+filter
    assert "WindowGroupLimit" in plan


def test_curation_queries_stay_jvm_side(spark, sf_dir):
    """The round-2 curation family is pure Column algebra — no Python
    evaluation stages anywhere."""
    for name in [
        "text_repetition",
        "decontaminate_ngrams",
        "dedup_incremental",
        "pii_scan",
        "docs_pack_sequences",
        "docs_weighted_sample",
        "corpus_curate",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"
        assert "CartesianProduct" not in plan, f"{name} has a cross join"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} nested-loops"


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    """Packing must shuffle ONCE on the shard key (the window) plus the
    final presentation sort — never a global single-partition window."""
    df = QUERIES["docs_pack_sequences"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_pii_scan_is_one_projection(spark, sf_dir):
    """Detection + redaction fuse into a single projection over the
    scan: no joins, no aggregation."""
    plan = plan_of(spark, sf_dir, "pii_scan")
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan and "Aggregate" not in plan, plan


def test_events_enrichment_dims_broadcast(spark, sf_dir):
    """Fact-side enrichment: customer and nation must both broadcast —
    the events fact table never shuffles for the join."""
    plan = plan_of(spark, sf_dir, "events_enriched")
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan


def test_json_extract_stays_jvm_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "events_json_extract")
    assert "EvalPython" not in plan
    assert "get_json_object" in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    """Q4's correlated EXISTS must be ONE left-semi hash join with the
    late-shipment predicate as join condition — no correlated re-scan
    of lineitem, and the quarter filter pushed to the orders scan."""
    plan = plan_of(spark, sf_dir, "tpch_q4_late_orders")
    assert "LeftSemi" in plan, plan
    fplan = formatted(spark, sf_dir, "tpch_q4_late_orders")
    assert "PushedFilters" in fplan and "o_orderdate" in fplan


def test_q6_single_scan_no_join(spark, sf_dir):
    """Q6 is scan-filter-agg: no join anywhere, all three predicates
    pushed, and only the 4 referenced columns read."""
    plan = plan_of(spark, sf_dir, "tpch_q6_revenue_forecast")
    assert "Join" not in plan, plan
    fplan = formatted(spark, sf_dir, "tpch_q6_revenue_forecast")
    read = [ln for ln in fplan.splitlines() if "ReadSchema" in ln]
    assert read and "l_returnflag" not in read[0] and "l_orderkey" not in read[0]


def test_q18_having_filter_broadcasts(spark, sf_dir):
    """Q18's HAVING subquery result (the ~1% large-order tail) must be
    broadcast into the semi join, and the big lineitem table must join
    the surviving orders via broadcast — lineitem itself never
    shuffles."""
    plan = plan_of(spark, sf_dir, "tpch_q18_large_orders")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_q21_semi_and_anti_on_same_key(spark, sf_dir):
    """Q21's EXISTS/NOT EXISTS pair must compile to one LeftSemi and one
    LeftAnti join (no correlated subquery re-execution)."""
    plan = plan_of(spark, sf_dir, "tpch_q21_late_sole_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    """Q22: the global-average is a 1-row broadcast (nested-loop or
    broadcast join, never a shuffle); no-recent-orders is LeftAnti with
    the date filter pushed to the orders scan."""
    plan = plan_of(spark, sf_dir, "tpch_q22_idle_customers")
    assert "LeftAnti" in plan, plan
    assert "Broadcast" in plan, plan


def test_tpch_completion_join_strategies(spark, sf_dir):
    """The q2/q8/q9/q16 star joins must broadcast every dimension (the
    only shuffles are on fact keys / distinct id pairs); q20's
    sq⋈pt join may sort-merge (two large aggregates sharing the p_key
    partitioning) but its part/supplier dims must broadcast."""
    for name, min_bhj in [
        ("tpch_q2_best_supplier", 3),
        ("tpch_q8_market_share", 4),
        ("tpch_q9_product_profit", 3),
        ("tpch_q16_supplier_cnt", 2),
        ("tpch_q20_excess_shippers", 2),
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        assert "BatchEvalPython" not in plan, name


def test_q11_scalar_subquery_broadcasts(spark, sf_dir):
    """q11's global-average threshold must join as a broadcast of ONE
    row (BroadcastNestedLoopJoin over the single-row aggregate), never
    a shuffled cross join."""
    plan = plan_of(spark, sf_dir, "tpch_q11_important_stock")
    assert "BroadcastNestedLoopJoin" in plan


def test_q16_anti_join_stays_anti(spark, sf_dir):
    """The supplier blacklist NOT IN must compile to LEFT ANTI."""
    plan = plan_of(spark, sf_dir, "tpch_q16_supplier_cnt")
    assert "LeftAnti" in plan


def test_new_pipeline_queries_stay_jvm_side(spark, sf_dir):
    """Round-4 additions that must not fall off the JVM path: the
    binary-Hamming scan (xor+popcount is pure codegen), the span
    rewrite, text cleanup, the PSI aggregation, and length batching.
    (docs_leakage_safe_split is excluded: its MinHash stage shares the
    vectorized signature site.)"""
    for name in [
        "embedding_binary_topk",
        "docs_strip_repeated_spans",
        "docs_clean_text",
        "corpus_drift_psi",
        "docs_length_batches",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_binary_hamming_query_side_broadcast(spark, sf_dir):
    """The b1 Hamming scan must broadcast the query signatures — the
    candidate side streams, nothing sort-merges."""
    plan = plan_of(spark, sf_dir, "embedding_binary_topk")
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_m2m_closure_frontier_broadcast(spark, sf_dir):
    """The m2m far side (part) is reached through two frontier
    semi-joins (assoc←root, far←assoc); with a bounded root (limit 25)
    both frontiers are small and must broadcast — never a full-table
    shuffle of lineitem or part."""
    plan = plan_of(spark, sf_dir, "closure_m2m__part")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_length_batches_per_shard_window(spark, sf_dir):
    """Per-shard batching must never move all rows to one partition:
    one hash shuffle on the shard key (plus aggregation/presentation
    exchanges), no Exchange SinglePartition anywhere (the r4 global
    row_number form was the repo's one scale-killer)."""
    df = QUERIES["docs_length_batches"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange SinglePartition" not in plan, plan


def test_partitioned_upsert_plan_prunes_and_anti_joins(spark, tmp_path):
    """The partition-pruned upsert's existing-side scan must carry
    PartitionFilters (literal partition predicate folded into the file
    listing) and remove matching PKs via a LEFT ANTI join — never a
    cartesian, never a Python eval. The on-disk effect (untouched
    partitions byte-identical) is pinned in test_sinks; this pins the
    plan shape that makes it cheap at 100 TB."""
    from dbcut_spark.sinks.insert_ignore import (
        _partition_filter,
        anti_new_rows,
    )

    path = str(tmp_path / "t.parquet")
    rows = [(i, i % 4, float(i)) for i in range(40)]
    spark.createDataFrame(rows, ["id", "p", "v"]).write.partitionBy("p").parquet(path)
    existing = spark.read.parquet(path)
    delta = spark.createDataFrame([(1, 1, -1.0), (100, 9, 9.0)], ["id", "p", "v"])
    touched = [{"p": 1}, {"p": 9}]
    scoped = existing.filter(_partition_filter(["p"], touched))
    keep = anti_new_rows(scoped, delta, ["id"])
    plan = keep._jdf.queryExecution().executedPlan().toString()
    tail = plan.split("PartitionFilters", 1)[1][:120]
    assert "PartitionFilters" in plan and ("p#" in tail and ("IN" in tail or "= 1" in tail))
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_tpcds_pack_plan_shapes(spark, sf_dir):
    """The TPC-DS-shaped pack's scale contracts: grouping lattices are
    ONE Expand + one aggregate exchange (not a union of per-set scans),
    star dims broadcast, set ops compile to broadcast semi/anti joins,
    and nothing falls out of codegen into Python."""
    plan = plan_of(spark, sf_dir, "tpcds_rollup_priority")
    assert plan.count("Expand") >= 1
    assert plan.count("Exchange hashpartitioning") == 1  # the lattice agg
    assert plan.count("BroadcastHashJoin") == 2  # customer + nation dims
    assert "Python" not in plan

    plan = plan_of(spark, sf_dir, "tpcds_cube_lineitem")
    assert "Expand" in plan and plan.count("Exchange hashpartitioning") == 1

    plan = plan_of(spark, sf_dir, "tpcds_grouping_sets")
    assert "Expand" in plan and plan.count("Exchange hashpartitioning") == 1

    plan = plan_of(spark, sf_dir, "tpcds_intersect_buyers")
    assert "LeftSemi" in plan and "Cartesian" not in plan

    plan = plan_of(spark, sf_dir, "tpcds_except_browsers")
    assert "LeftAnti" in plan and "Cartesian" not in plan

    # windows ride one pre-aggregated exchange; no extra self-join scan
    plan = plan_of(spark, sf_dir, "tpcds_yoy_nation")
    assert "Window" in plan and plan.count("FileScan") == 3  # o + c + n
    # above-avg: the class mean is a 5-row aggregate BROADCAST back
    # onto the fact scan, NOT a window — a window partitioned on the
    # 5-value priority key funnels the whole fact table into 5 reducer
    # tasks (round-10 review); two scans (means + fact) is the price
    # of keeping full map-side parallelism
    plan = plan_of(spark, sf_dir, "tpcds_above_avg_orders")
    assert "BroadcastHashJoin" in plan and plan.count("FileScan") == 2
    assert "Window [" not in plan  # no partition-collapse window


def test_closure_frontier_shape_gets_dynamic_partition_pruning(spark, tmp_path):
    """The closure docstring claims partitioned children get DPP-style
    pruning when the FK is the partition column. Pin the primitive: a
    broadcast LEFT SEMI against a derived (filtered) key set — the
    frontier shape — injects dynamicpruningexpression into the child
    scan's PartitionFilters, so only the frontier's partitions are
    listed/read."""
    from pyspark.sql import functions as F2

    child_path = str(tmp_path / "child.parquet")
    spark.range(0, 100_000).select(
        (F2.col("id") % 50).alias("fk"), F2.col("id").alias("v")
    ).write.partitionBy("fk").parquet(child_path)
    dim_path = str(tmp_path / "dim.parquet")
    spark.range(0, 50).select(
        F2.col("id").alias("fk"), (F2.col("id") % 7).alias("grp")
    ).write.parquet(dim_path)

    child = spark.read.parquet(child_path)
    keys = spark.read.parquet(dim_path).filter(F2.col("grp") == 0).select("fk")
    j = child.join(F2.broadcast(keys), on=["fk"], how="left_semi")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan


def test_hybrid_rrf_no_cartesian_and_broadcast_queries(spark, sf_dir):
    """docs_hybrid_rrf: the lexical side must be an inverted-index
    equi-join on token (never a doc x doc cartesian) and the semantic
    side must broadcast the 10-query frame through the candidate scan."""
    plan = plan_of(spark, sf_dir, "docs_hybrid_rrf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the scoring cross of 10 queries x N candidates rides a broadcast,
    # not a shuffle of the candidate table
    assert "BroadcastExchange" in plan


def test_scd2_single_user_shuffle(spark, sf_dir):
    """events_scd2_state: lag, running-sum, island agg, and lead all
    reuse ONE hash partitioning by user_id — exactly one shuffle of the
    event rows (plus the final presentation sort)."""
    plan = plan_of(spark, sf_dir, "events_scd2_state")
    import re

    exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Sort" not in ln
    ]
    hash_parts = [ln for ln in exchanges if "hashpartitioning" in ln]
    # one user_id hash exchange; the only other allowed exchange is the
    # rangepartitioning for the deterministic output order
    assert len(hash_parts) == 1, plan
    assert "user_id" in hash_parts[0]
    assert all(
        "rangepartitioning" in ln for ln in exchanges if ln not in hash_parts
    ), plan
    assert "EvalPython" not in plan
