"""Epoch string materialization determinism (ADVICE r2): duplicate frontier
copies share a url_hash but canonicalization twins differ in the raw url and
discovered_at — the strings that rejoin after compact-key admission must
belong to the SAME copy dedup.supersede scheduled (lowest (priority, seq) at
equal attempt), not an arbitrary one.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlspark import datagen
from crawlspark.config import CrawlConfig
from crawlspark.functions.urls import canonicalize_url, hash64, host_of
from crawlspark.plans.crawler import init_run
from crawlspark.plans.epoch import run_epoch
from crawlspark.tables import SnapshotStore


def _frontier_with_twins() -> pd.DataFrame:
    """Three copies of one canonical URL with DISTINCT raw strings and
    (priority, seq): the winner under the supersede rule is the (0, 1) copy
    with the plain-lowercase url; the uppercase-host and #frag twins must
    never surface in crawl_log."""
    raws = [
        ("http://HOST0001.example.com/img/img_000000000003", 1, 7),   # twin
        ("http://host0001.example.com/img/img_000000000003", 0, 1),   # winner
        ("http://host0001.example.com/img/img_000000000003#frag", 0, 5),
        # plus two unrelated singleton urls so the epoch isn't degenerate
        ("http://host0002.example.com/img/img_000000000001", 0, 2),
        ("http://host0003.example.com/img/img_000000000002", 1, 3),
    ]
    df = pd.DataFrame([{"url": u, "priority": p, "seq": s}
                       for (u, p, s) in raws])
    df["priority"] = df["priority"].astype(np.int32)
    df["seq"] = df["seq"].astype(np.int64)
    canon = df["url"].map(canonicalize_url)
    df["url_hash"] = canon.map(hash64).astype(np.int64)
    df["host"] = df["url"].map(host_of)
    df["host_hash"] = df["host"].map(hash64).astype(np.int64)
    df["image_id"] = canon.str.extract(r"(img_\d{12})")[0]
    df["attempt"] = np.int32(0)
    df["not_before_epoch"] = np.int32(0)
    # distinct discovered_at per copy so an arbitrary pick is detectable
    df["discovered_at"] = (datagen.BASE_EPOCH_TS
                           + pd.to_timedelta(df["seq"], unit="s")
                           ).astype("datetime64[us, UTC]")
    return df[["url", "url_hash", "host", "host_hash", "priority", "seq",
               "image_id", "attempt", "not_before_epoch", "discovered_at"]]


def test_materialized_strings_match_supersede_winner(spark, tmp_path):
    spec = datagen.GenSpec(seed=5, n_images=10, n_urls=10, n_hosts=4)
    fx = str(tmp_path / "fx")
    os.makedirs(fx)
    pq.write_table(pa.Table.from_pandas(_frontier_with_twins(),
                                        preserve_index=False),
                   os.path.join(fx, "frontier.parquet"))
    for name, pdf in (("robots", datagen.gen_robots(spec)),
                      ("budgets", datagen.gen_budgets(spec))):
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(fx, f"{name}.parquet"))
    images = spark.createDataFrame(datagen.gen_image_caption(spec))

    store = SnapshotStore(str(tmp_path / "store"))
    init_run(spark, store,
             frontier=spark.read.parquet(os.path.join(fx, "frontier.parquet")),
             robots=spark.read.parquet(os.path.join(fx, "robots.parquet")),
             budgets=spark.read.parquet(os.path.join(fx, "budgets.parquet")))
    run_epoch(spark, store, images, CrawlConfig(batch_size=50), epoch=0)

    log = store.read(spark, "crawl_log").toPandas()
    dup_hash = hash64(canonicalize_url(
        "http://HOST0001.example.com/img/img_000000000003"))
    rows = log[log["url_hash"] == dup_hash]
    assert len(rows) == 1  # one scheduled row for the three copies
    assert rows.iloc[0]["url"] == \
        "http://host0001.example.com/img/img_000000000003"  # winner's raw url
