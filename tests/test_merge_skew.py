"""merge_into under heavy key skew (the 100-TB MERGE story, VERDICT r2 #7).

One key holds 50% of a 20k-row update batch. The dedup stage must collapse
it map-side (partial_max_by — one candidate per map partition reaches the
shuffle), correctness must hold (newest update wins for every key, exactly
one row per key), and replaying the same merge must be a no-op. AQE
skew-join stays enabled in the session as the backstop for target-side skew
(session.py sets spark.sql.adaptive.skewJoin.enabled=true).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.tables import SnapshotStore, dedup_updates, merge_into

N = 20_000
HOT = 7  # the skewed key


def _skewed_updates(spark):
    """Even ids all map to key HOT (50% of the batch); odd ids are unique
    keys. newer_col = ts = id, so the winner for HOT is ts = N-2."""
    return spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT))
        .otherwise(F.col("id") + 1_000_000).alias("k"),
        F.col("id").alias("ts"),
        (F.col("id") * 2).alias("payload"))


def test_dedup_updates_partial_agg_under_skew(spark):
    """The skew neutralizer: the hot key collapses BEFORE the shuffle
    (partial_max_by in the plan, never a Window), so a 50%-hot update batch
    shuffles at most one hot-key row per map partition."""
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        dedup_updates(_skewed_updates(spark), "k", "ts")
        ._jdf.queryExecution(), "formatted")
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_merge_into_correct_under_skew(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})

    # seed target: keys 0..99 with ts=-1 (HOT among them), so the skewed
    # batch exercises both MATCHED-newer and NOT-MATCHED arms
    seed = spark.range(100).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("ts"),
        F.lit(0).cast("long").alias("payload"))
    merge_into(spark, store, "t", seed, "k", newer_col="ts")

    merge_into(spark, store, "t", _skewed_updates(spark), "k", newer_col="ts")
    got = store.read(spark, "t")

    # one row per key, no duplicates from the hot key
    assert got.count() == got.select("k").distinct().count()
    hot = got.filter(F.col("k") == HOT).collect()
    assert len(hot) == 1
    assert hot[0]["ts"] == N - 2           # newest even id wins
    assert hot[0]["payload"] == 2 * (N - 2)
    # untouched seed keys keep their rows; updated unique keys landed
    assert got.filter(F.col("ts") == -1).count() == 99   # all but HOT
    assert got.filter(F.col("k") >= 1_000_000).count() == N // 2

    # replaying the identical skewed batch is a no-op (idempotent MERGE)
    before = sorted(map(tuple, got.collect()))
    merge_into(spark, store, "t", _skewed_updates(spark), "k", newer_col="ts")
    after = sorted(map(tuple, store.read(spark, "t").collect()))
    assert before == after


def test_merge_no_straggler_partition_after_dedup(spark):
    """Downstream of the dedup, keys are unique, so the shuffle partitions
    feeding the anti-join are balanced — no partition holds more than a few
    times the mean (the hot key's 10k raw rows never reach this stage)."""
    deduped = dedup_updates(_skewed_updates(spark), "k", "ts")
    sizes = (deduped.repartition(8, "k")
             .withColumn("p", F.spark_partition_id())
             .groupBy("p").count().collect())
    counts = [r["count"] for r in sizes]
    assert max(counts) <= 3 * (sum(counts) / len(counts))
