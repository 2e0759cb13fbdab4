"""Operator-level equivalence tests for admission + supersede (SURVEY.md §5.5).

* window-algebra ``admit`` == GROUPED_MAP ``admit_apply_in_pandas`` (the two
  implementations of the token-bucket custom stateful operator, T3/V6)
* ``admit(host_key="host_hash")`` (compact-key / late-materialization path
  used by bench.py) == string-host path
* hash-agg ``supersede`` == window ``supersede_window`` (J2/J3 dedup)
* politeness invariant: no host ever exceeds its available tokens
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark import datagen
from crawlspark.operators import dedup, politeness

SPEC = datagen.GenSpec(seed=7, n_images=50, n_urls=600, n_hosts=12, n_strata=4)


@pytest.fixture(scope="module")
def dfs(spark):
    frontier = spark.createDataFrame(datagen.gen_frontier(SPEC))
    budgets = spark.createDataFrame(datagen.gen_budgets(SPEC))
    return frontier, budgets


def _admitted_keys(df) -> list[tuple]:
    pdf = df.select("admission_idx", "url_hash").toPandas()
    return sorted(map(tuple, pdf.itertuples(index=False)))


def test_admit_equals_grouped_map(dfs):
    frontier, budgets = dfs
    cand = dedup.supersede(frontier)
    a = politeness.admit(cand, budgets, epoch=0, batch_size=80)
    b = politeness.admit_apply_in_pandas(cand, budgets, epoch=0, batch_size=80)
    assert _admitted_keys(a) == _admitted_keys(b)
    assert a.count() > 0


def test_admit_host_hash_key_equivalent(dfs):
    frontier, budgets = dfs
    cand = dedup.supersede(frontier)
    by_host = politeness.admit(cand, budgets, epoch=0, batch_size=80)
    # gen_budgets carries no host_hash; candidates are keyed with the
    # canonical hash64, so explicit opt-in derivation is correct here
    by_hash = politeness.admit(cand, budgets, epoch=0, batch_size=80,
                               host_key="host_hash",
                               derive_missing_host_key=True)
    assert _admitted_keys(by_host) == _admitted_keys(by_hash)
    # without the opt-in, a missing budgets column fails fast instead of
    # silently admitting nothing
    with pytest.raises(ValueError, match="host_hash"):
        politeness.admit(cand, budgets, epoch=0, batch_size=80,
                         host_key="host_hash")


def test_supersede_hash_agg_equals_window(spark, dfs):
    frontier, _ = dfs
    # union a retry copy for ~20% of urls (higher attempt must win)
    retry = (frontier.limit(120)
             .withColumn("attempt", frontier["attempt"] + 2)
             .withColumn("not_before_epoch", frontier["not_before_epoch"] + 3))
    pending = frontier.unionByName(retry)
    a = dedup.supersede(pending).toPandas()
    b = dedup.supersede_window(pending).toPandas()
    key = ["url_hash", "attempt", "not_before_epoch", "priority", "seq"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True))
    assert a["url_hash"].is_unique


def test_no_host_exceeds_budget(dfs):
    frontier, budgets = dfs
    cand = dedup.supersede(frontier)
    admitted = politeness.admit(cand, budgets, epoch=0, batch_size=10_000)
    per_host = admitted.groupBy("host").count().toPandas().set_index("host")["count"]
    avail = politeness.availability(budgets, 0).toPandas().set_index("host")["avail"]
    for host, n in per_host.items():
        assert n <= avail[host], f"{host} admitted {n} > avail {avail[host]}"
