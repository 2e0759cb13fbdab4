"""Property-style invariants over a full crawl (SURVEY.md §5.5), seeded
deterministically:

* dedup idempotence — after the frontier drains, further epochs change
  nothing (re-crawling the same frontier adds no rows);
* retry cap — no URL is fetch-attempted more than max_attempts times
  (tenacity stop_after_attempt analog, github_api.py:70-74);
* terminal-status exclusivity — every url_hash in url_seen has exactly one
  terminal log row (ok / invalid_payload / failed / robots_denied);
* attempt monotonicity — per url, attempts in the log never decrease over
  epochs and rise by at most 1 per fetch.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # module-scoped drained-crawl property checks (minutes)

from crawlspark import datagen
from crawlspark.config import CrawlConfig
from crawlspark.plans.crawler import run_crawl
from tests.crawl_fixtures import init_store, make_oracle, write_fixtures

SPEC = datagen.GenSpec(seed=1337, n_images=50, n_urls=350, n_hosts=8,
                       n_strata=3, dup_rate=0.15)
CFG = CrawlConfig(batch_size=40, n_filter_buckets=8,
                  transient_fail_per_mille=150, secondary_limit_per_mille=30)

TERMINAL = {"ok", "invalid_payload", "failed", "robots_denied"}


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fixtures")
    write_fixtures(str(tmp), SPEC)
    store = init_store(spark, str(tmp), str(tmp_path_factory.mktemp("store")))
    images = spark.read.parquet(str(tmp / "image_caption.parquet"))
    run_crawl(spark, store, images, CFG, max_epochs=80)
    log = store.read(spark, "crawl_log").toPandas()
    seen = store.read(spark, "url_seen").toPandas()
    return dict(store=store, images=images, log=log, seen=seen)


def test_idempotent_after_drain(spark, drained):
    """More epochs on a drained frontier are no-ops (dedup idempotence)."""
    store = drained["store"]
    n_log = len(drained["log"])
    n_seen = len(drained["seen"])
    extra = run_crawl(spark, store, drained["images"], CFG, max_epochs=6,
                      stop_after_empty=2)
    assert all(r.n_admitted + r.n_denied == 0 for r in extra)
    assert store.read(spark, "crawl_log").count() == n_log
    assert store.read(spark, "url_seen").count() == n_seen


def test_retry_cap(drained):
    log = drained["log"]
    fetched = log[log["admission_idx"].notna()]
    per_url = fetched.groupby("url_hash").size()
    assert (per_url <= CFG.max_attempts).all()
    assert (log["attempt"] < CFG.max_attempts).all()


def test_terminal_exclusivity(drained):
    log = drained["log"]
    term = log[log["status"].isin(TERMINAL)]
    counts = term.groupby("url_hash").size()
    assert (counts == 1).all(), "a url reached more than one terminal status"
    assert set(drained["seen"]["url_hash"]) == set(term["url_hash"])


def test_attempt_monotone_per_url(drained):
    log = drained["log"].sort_values(["url_hash", "epoch"])
    for _, grp in log[log["admission_idx"].notna()].groupby("url_hash"):
        att = grp["attempt"].tolist()
        assert att == sorted(att)
        assert all(b - a <= 1 for a, b in zip(att, att[1:]))
