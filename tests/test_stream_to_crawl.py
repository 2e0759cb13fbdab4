"""End-to-end integration of the push and pull halves of the engine: a
discovery stream folds into the frontier (streaming.ingest), then the batch
epoch loop crawls the combined frontier to drain. The invariant that makes
the whole pipeline correct at 10^10 URLs: after drain, url_seen holds
EXACTLY one row per distinct canonical URL ever enqueued (initial frontier
union streamed discoveries, twins collapsed), and no URL is fetched 'ok'
twice.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # module-scoped multi-trigger stream + crawl loop (minutes)

from crawlspark import datagen
from crawlspark.config import CrawlConfig
from crawlspark.functions.urls import url_hash64
from crawlspark.plans.crawler import run_crawl
from crawlspark.streaming import ingest
from tests.crawl_fixtures import SMALL, init_store, write_fixtures

DISC_COLS = ["url", "priority", "seq", "image_id", "discovered_at"]


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fx")
    pdfs = write_fixtures(str(tmp), SMALL)
    store = init_store(spark, str(tmp), str(tmp_path_factory.mktemp("store")))

    # discoveries: a fresh slice (seed 77 -> mostly new urls) + exact twins
    # of the first 30 initial-frontier urls (must dedupe against url_seen /
    # the enqueued frontier, never crawl twice)
    disc_spec = datagen.GenSpec(seed=77, n_images=SMALL.n_images,
                                n_urls=200, n_hosts=SMALL.n_hosts,
                                n_strata=SMALL.n_strata)
    disc = datagen.gen_frontier(disc_spec)[DISC_COLS]
    twins = pdfs["frontier"][DISC_COLS].iloc[:30].copy()
    twins["url"] = twins["url"].str.replace("http://host", "http://HOST",
                                            n=1, regex=False)
    disc = pd.concat([disc, twins], ignore_index=True)
    disc["priority"] = disc["priority"].astype("int32")
    disc["seq"] = np.arange(len(disc), dtype=np.int64) + 10_000
    disc["discovered_at"] = (
        pd.Timestamp("2026-01-01T00:00:00Z")
        + pd.to_timedelta(disc["seq"], unit="s")).astype("datetime64[us, UTC]")

    ddir = str(tmp_path_factory.mktemp("disc"))
    for i, chunk in enumerate((disc.iloc[:120], disc.iloc[120:])):
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False),
                       os.path.join(ddir, f"chunk-{i}.parquet"))

    raw = ingest.discovery_file_stream(spark, ddir)
    q = ingest.fold_into_frontier(spark, ingest.enrich_discoveries(raw),
                                  store, str(tmp_path_factory.mktemp("ckpt")))
    q.awaitTermination(300)

    images = spark.createDataFrame(pdfs["image_caption"])
    run_crawl(spark, store, images, CrawlConfig(batch_size=60),
              max_epochs=300)
    expected_hashes = {url_hash64(u) for u in
                       list(pdfs["frontier"]["url"]) + list(disc["url"])}
    return dict(store=store, expected=expected_hashes)


def test_seen_set_is_exactly_the_distinct_canonical_urls(spark, drained):
    seen = drained["store"].read(spark, "url_seen").toPandas()
    assert len(seen) == seen["url_hash"].nunique()       # one row per url
    assert set(seen["url_hash"]) == drained["expected"]  # nothing lost/extra


def test_no_url_fetched_ok_twice(spark, drained):
    log = drained["store"].read(spark, "crawl_log").toPandas()
    ok = log[log["status"] == "ok"]
    assert ok["url_hash"].is_unique
    # every url_hash in the log reached exactly one terminal status
    terminal = log[log["status"].isin(
        ["ok", "invalid_payload", "failed", "robots_denied"])]
    assert terminal["url_hash"].is_unique


def test_admission_chained_into_frontier_fold_multi_trigger(
        spark, tmp_path_factory):
    """The two streaming halves as ONE job across >=3 triggers (VERDICT r3
    item 7): file source -> applyInPandasWithState token-bucket admission ->
    projection -> foreachBatch frontier fold-in. The bucket's token state
    must carry across trigger boundaries (denials at trigger 0, refill
    credit later), only ADMITTED rows may reach the frontier, and re-sent
    urls dedupe against the already-enqueued frontier — all asserted
    against the pure-pandas simulate_token_bucket oracle."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from crawlspark.functions.urls import hash64_col
    from crawlspark.streaming.stateful import (simulate_token_bucket,
                                               token_bucket_admission)
    from crawlspark.tables import SnapshotStore

    def rows(host, n, seq0):
        return pd.DataFrame({
            "host": host,
            "url": [f"http://{host}/img/img_{seq0 + i:012d}"
                    for i in range(n)],
            "url_hash": [hash((host, seq0 + i)) % (1 << 60)
                         for i in range(n)],
            "priority": pd.array([0] * n, dtype="int32"),
            "seq": pd.array(range(seq0, seq0 + n), dtype="int64"),
        })

    A, B = "slow.example.com", "fast.example.com"
    t0 = rows(A, 4, 0)                       # cap 2 -> 2 admitted, 2 denied
    t1 = rows(A, 2, 100)                     # refill 1 -> 1 admitted
    t2 = pd.concat([t0.iloc[:1], rows(A, 1, 200)],
                   ignore_index=True)        # re-sent url + 1 fresh
    t3 = rows(B, 3, 300)                     # new host, fresh bucket
    parts = [t0, t1, t2, t3]
    budgets = {A: (2, 1), B: (8, 4)}

    ddir = str(tmp_path_factory.mktemp("chain"))
    for i, chunk in enumerate(parts):
        chunk = chunk.copy()
        chunk["trigger_idx"] = pd.array([i] * len(chunk), dtype="int32")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False),
                       os.path.join(ddir, f"chunk-{i}.parquet"))

    schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("trigger_idx", T.IntegerType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(ddir))
    admitted = (token_bucket_admission(stream, budgets)
                .filter(F.col("admitted"))
                .select(
                    "url", "url_hash", "host",
                    hash64_col(F.col("host")).alias("host_hash"),
                    "priority", "seq",
                    F.regexp_extract("url", r"(img_\d{12})", 1)
                    .alias("image_id"),
                    F.lit(0).cast("int").alias("attempt"),
                    F.lit(0).cast("int").alias("not_before_epoch"),
                    (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                     + F.make_interval(secs=F.col("seq")))
                    .alias("discovered_at")))

    store = SnapshotStore(str(tmp_path_factory.mktemp("chainstore")))
    q = ingest.fold_into_frontier(spark, admitted, store,
                                  str(tmp_path_factory.mktemp("chainckpt")))
    q.awaitTermination(300)

    # oracle: same parts, same budgets, pure pandas
    exp = simulate_token_bucket(parts, budgets)
    exp_admitted = exp[exp["admitted"]]
    exp_hashes = set(exp_admitted["url_hash"])

    frontier = store.read(spark, "frontier").toPandas()
    assert set(frontier["url_hash"]) == exp_hashes     # only admitted rows
    assert len(frontier) == len(exp_hashes)            # re-sent url deduped
    # the bucket genuinely carried state across triggers: trigger-0 denials
    denied0 = exp[(exp["trigger_seq"] == 0) & ~exp["admitted"]]
    assert len(denied0) == 2
    assert not set(denied0["url_hash"]) & set(frontier["url_hash"])
    # >= 3 triggers actually fired through the chained sink
    assert int(store.snapshot().meta["last_discovery_batch"]) >= 3
    remaining = store.snapshot().meta["remaining_by_priority"]
    assert sum(int(v) for v in remaining.values()) == len(exp_hashes)
