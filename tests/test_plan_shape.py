"""Plan-shape assertions (SURVEY.md §5.6): the physical plans Catalyst picks
must be the ones the engine is designed around — filters and projections
pushed into the parquet scan, small dims broadcast, no cartesian products,
whole-stage codegen on the hot paths. A correct-but-mis-planned operator is
a scale bug even when row-for-row right.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def orders(spark, sf001):
    return spark.read.parquet(f"{sf001}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark, sf001):
    return spark.read.parquet(f"{sf001}/customer.parquet")


def test_filter_pushdown_to_parquet(orders):
    """S3/F8: equality + range predicates reach the scan as PushedFilters."""
    df = orders.filter((F.col("o_orderkey") == 42) &
                       (F.col("o_totalprice") > 1000.0)).select("o_orderkey")
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "IsNotNull(o_orderkey)" in plan or "EqualTo(o_orderkey,42)" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_column_pruning(orders):
    """A 2-column projection must not read all 9 orders columns."""
    df = orders.select("o_orderkey", "o_custkey")
    plan = plan_of(df)
    rs = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert rs, plan
    assert "o_orderkey" in rs[0] and "o_custkey" in rs[0]
    assert "o_comment" not in rs[0] and "o_totalprice" not in rs[0]


def test_small_dim_join_broadcasts(orders, customer):
    """J1/J4: the customer dim side goes over BroadcastExchange/
    BroadcastHashJoin — never a shuffle for a small dim."""
    df = orders.join(F.broadcast(customer.select("c_custkey", "c_mktsegment")),
                     orders["o_custkey"] == customer["c_custkey"])
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_anti_join_no_cartesian(spark, orders):
    """J2: the dedup anti-join plans as a hash/broadcast join."""
    seen = orders.select("o_orderkey").limit(100)
    df = orders.join(seen, "o_orderkey", "left_anti")
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_hot_path_is_whole_stage_codegen(orders):
    """C-family scalar exprs stay inside WholeStageCodegen (no Python in
    the hot path)."""
    df = (orders
          .withColumn("fn", F.concat_ws("/", "o_orderpriority", "o_orderstatus"))
          .withColumn("clean", F.regexp_replace("o_orderpriority", "[\\t\\n]", " "))
          .filter(F.col("o_totalprice").between(100, 200000)))
    plan = plan_of(df)
    assert "codegen id" in plan  # formatted-mode marker for WholeStageCodegen
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_paginated_scan_native_offset(spark, sf001):
    """S5: LIMIT/OFFSET pagination must plan as TakeOrderedAndProject with a
    native offset — never a row_number over an unpartitioned Window, which
    funnels every row through one task."""
    from crawlspark.queries import QUERIES

    plan = plan_of(QUERIES["paginated_scan"](spark, sf001))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_dedup_embedding_no_nested_loop(spark, sf001):
    """Embedding near-dup pairs join on a sign-LSH bucket equi-key: the plan
    must be a hash/sort-merge/broadcast-hash join, never BroadcastNestedLoop
    or a cartesian product (all-pairs does not survive 10^10 vectors)."""
    from crawlspark.textops import QUERIES

    plan = plan_of(QUERIES["dedup_embedding"](spark, sf001))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_phash_band_equi_join_verify_before_distinct(spark, sf001):
    """dedup_phash candidates come from the 8x8-bit band EQUI-join (never
    all-pairs — a nested-loop over 10^10 images is the plan this operator
    exists to avoid), the hamming verify runs as a JVM-side Filter BEFORE
    the pair-dedup exchange (false candidates — the vast majority — never
    enter the distinct shuffle), and the phash scan reads only the two
    columns the operator needs (no bytes/caption in ReadSchema)."""
    from crawlspark.textops import QUERIES

    df = QUERIES["dedup_phash"](spark, sf001)
    plan = plan_of(df)
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    rs = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert rs and "phash" in rs[0]
    assert "bytes" not in rs[0] and "caption" not in rs[0]
    # optimized logical plan prints parent-first: the pair-distinct
    # Aggregate must appear ABOVE the bit_count verify Filter (i.e. the
    # filter executes first). Catalyst cannot derive this reorder itself —
    # hamming is not a grouping column — so the operator must declare it.
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    dedup_line = logical.index("Aggregate")
    verify_line = logical.index("bit_count")
    assert dedup_line < verify_line, logical


def test_admission_shuffles_are_compact(spark):
    """Late materialization: the admission Window/Exchange stages must carry
    compact hashed keys only — no url/host STRING columns through the sorts
    (they rejoin via broadcast after admission). Formatted-plan nodes are
    checked block by block."""
    from crawlspark import datagen
    from crawlspark.operators import politeness

    spec = datagen.GenSpec(seed=3, n_images=20, n_urls=200, n_hosts=6)
    cand = spark.createDataFrame(datagen.gen_frontier(spec)) \
        .dropDuplicates(["url_hash"])
    budgets = spark.createDataFrame(datagen.gen_budgets(spec))
    df = politeness.admit_late_materialized(cand, budgets, epoch=0,
                                            batch_size=50)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # the string rejoin is broadcast
    for block in plan.split("\n\n"):
        if "Window" in block or "Exchange hashpartitioning" in block:
            assert " url#" not in block and " host#" not in block, block


def test_ann_ivf_assignment_partial_agg_no_window(spark, sf01):
    """The IVF centroid-assignment argmax must never materialize the C x N
    candidate relation in the JVM: r6 moved it into ONE Arrow-batched
    MapInPandas pass (vectorized per-vector argmax against the broadcast
    centroid matrix — bit-identical fold order to the r5 max_by aggregate,
    asserted value-equal in test_textops.py's oracle row). The plan must
    show the Arrow stage and still no row_number window and no cartesian
    product (a window would globally shuffle-sort all C x N assignment rows
    at 10^10 vectors)."""
    from crawlspark.textops import QUERIES

    plan = plan_of(QUERIES["ann_ivf"](spark, sf01))
    assert "MapInPandas" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_supersede_partial_agg_no_window(spark):
    """The frontier dedup must plan as an aggregate WITH map-side partial
    (duplicates collapse before the shuffle) and no Window — at 10^10 rows a
    window would shuffle and sort every row globally."""
    from crawlspark.operators import dedup

    frontier = spark.range(1000).select(
        F.col("id").alias("url_hash"),
        (F.col("id") % 7).alias("host_hash"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.col("id").alias("seq"),
        F.lit(0).cast("int").alias("attempt"),
        F.lit(0).cast("int").alias("not_before_epoch"))
    plan = plan_of(dedup.supersede(frontier))
    assert "partial_max_by" in plan  # map-side combine
    assert "Window" not in plan
