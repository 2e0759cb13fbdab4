"""Resumability (T2 / north_rule "resumable from the last committed
snapshot"): a crawl interrupted between epochs and restarted from a FRESH
SnapshotStore handle must produce exactly the same final crawl_log ordering
and URL-seen set as the uninterrupted oracle run (SURVEY.md §5.4; analog of
--resume via last_cursor, /root/reference/src/application/use_cases.py:68-74).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # module-scoped kill/resume crawls (minutes)

from crawlspark.plans.crawler import run_crawl
from crawlspark.tables import SnapshotStore
from tests.crawl_fixtures import SMALL, SMALL_CFG, init_store, make_oracle, write_fixtures


@pytest.fixture(scope="module")
def interrupted_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fixtures")
    pdfs = write_fixtures(str(tmp), SMALL)
    store_dir = str(tmp_path_factory.mktemp("store"))
    store = init_store(spark, str(tmp), store_dir)
    images = spark.read.parquet(str(tmp / "image_caption.parquet"))

    # run 3 epochs, then "crash" (drop the handle mid-run)
    first = run_crawl(spark, store, images, SMALL_CFG, max_epochs=3)
    assert len(first) == 3
    del store

    # restart: a brand-new handle on the same directory resumes from the
    # last committed snapshot
    store2 = SnapshotStore(store_dir)
    second = run_crawl(spark, store2, images, SMALL_CFG, max_epochs=60)
    assert second[0].epoch == 3  # continued, not restarted

    oracle = make_oracle(pdfs, SMALL_CFG)
    oracle.run(max_epochs=60)
    log = store2.read(spark, "crawl_log").toPandas()
    seen = store2.read(spark, "url_seen").toPandas()
    return dict(log=log, seen=seen, oracle=oracle)


def test_resume_seen_set_matches_oracle(interrupted_run):
    engine_seen = set(interrupted_run["seen"]["url_hash"].tolist())
    assert engine_seen == interrupted_run["oracle"].golden_seen()


def test_resume_ordering_matches_oracle(interrupted_run):
    log = interrupted_run["log"]
    admitted = log[log["admission_idx"].notna()].sort_values(
        ["epoch", "admission_idx"])
    engine_order = list(zip(admitted["epoch"].astype(int),
                            admitted["admission_idx"].astype(int),
                            admitted["url_hash"].astype(int)))
    assert engine_order == interrupted_run["oracle"].golden_order()


def test_no_duplicate_log_rows(interrupted_run):
    """Atomic per-epoch commits mean the interrupted run never double-logs."""
    log = interrupted_run["log"]
    keyed = log[log["admission_idx"].notna()]
    assert not keyed.duplicated(subset=["epoch", "admission_idx"]).any()
    assert not interrupted_run["seen"].duplicated(subset=["url_hash"]).any()
