"""Job lifecycle FSM (T11 failed rows), fallback broadening (T9),
health-check surface, and MERGE upsert (S7/S8).

Reference contracts reproduced:
  * status=failed + error_message persisted on a crashed run
    (/root/reference/src/application/use_cases.py:168-191, database.py:396-419)
  * broad fallback strata appended once when the crawl space exhausts below
    target (/root/reference/src/infrastructure/github_api.py:588-604)
  * health-check per-component dict (main.py:233-273, use_cases.py:296-356)
  * single-row + batch ON CONFLICT upsert (database.py:120-172, 174-271)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # module-scoped lifecycle crawls incl. broadening (minutes)
from pyspark.sql import functions as F

from crawlspark import datagen
from crawlspark.config import CrawlConfig
from crawlspark.plans import epoch as epoch_mod
from crawlspark.plans.crawler import run_crawl
from crawlspark.sources.export import health_check
from crawlspark.tables import SnapshotStore, merge_into, upsert_row
from tests.crawl_fixtures import init_store, make_oracle, write_fixtures

TINY = datagen.GenSpec(seed=7, n_images=40, n_urls=150, n_hosts=8, n_strata=3)
TINY_CFG = CrawlConfig(batch_size=40, n_filter_buckets=8,
                       backoff_max_epochs=4, secondary_backoff_epochs=2)
# broader fallback strata: same hosts (budgets cover them), lower priority
FB_SPEC = datagen.GenSpec(seed=99, n_images=40, n_urls=80, n_hosts=8,
                          n_strata=2)


def _fallback_frontier():
    fb = datagen.gen_frontier(FB_SPEC)
    fb["priority"] = (fb["priority"] + TINY.n_strata).astype("int32")
    return fb


# ---------------------------------------------------------------------------
# T11: failed-job rows
# ---------------------------------------------------------------------------

def test_failed_epoch_records_job_row(spark, tmp_path, monkeypatch):
    fx = str(tmp_path / "fx")
    write_fixtures(fx, TINY)
    store = init_store(spark, fx, str(tmp_path / "store"))
    images = spark.read.parquet(os.path.join(fx, "image_caption.parquet"))

    def boom(*a, **k):
        raise RuntimeError("simulated mid-epoch failure")

    monkeypatch.setattr(epoch_mod, "fetch_and_validate", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        run_crawl(spark, store, images, TINY_CFG, max_epochs=3)

    jobs = store.read(spark, "crawl_jobs").collect()
    assert len(jobs) == 1
    assert jobs[0]["status"] == "failed"
    assert "simulated mid-epoch failure" in jobs[0]["error_message"]
    # nothing from the failed epoch was committed; the epoch will be retried
    assert store.read(spark, "crawl_log") is None
    assert int(store.snapshot().meta["last_epoch"]) == -1
    assert health_check(spark, store)["status"] == "degraded"

    # recovery: the same store resumes at the failed epoch and completes
    monkeypatch.undo()
    res = run_crawl(spark, store, images, TINY_CFG, max_epochs=2)
    assert res[0].epoch == 0
    jobs2 = store.read(spark, "crawl_jobs")
    assert jobs2.filter(F.col("status") == "completed").count() >= 1
    assert jobs2.filter(F.col("status") == "failed").count() == 1
    hc = health_check(spark, store)
    assert hc["status"] == "healthy"
    assert hc["tables"]["crawl_log"]["n_rows"] > 0
    assert hc["last_job"]["status"] == "completed"
    assert hc["budgets"]["n_hosts"] == TINY.n_hosts


# ---------------------------------------------------------------------------
# T9: fallback broadening, ordering + seen-set parity vs the oracle
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def broadened_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fx9")
    pdfs = write_fixtures(str(tmp), TINY)
    fb = _fallback_frontier()
    fb_path = str(tmp / "fallback.parquet")
    pq.write_table(pa.Table.from_pandas(fb, preserve_index=False), fb_path)

    store = init_store(spark, str(tmp), str(tmp_path_factory.mktemp("st9")))
    images = spark.read.parquet(str(tmp / "image_caption.parquet"))
    run_crawl(spark, store, images, TINY_CFG, max_epochs=120,
              fallback=spark.read.parquet(fb_path), target_results=10 ** 9)

    oracle = make_oracle(pdfs, TINY_CFG)
    oracle.run(max_epochs=120, fallback=fb, target_results=10 ** 9)

    return dict(
        log=store.read(spark, "crawl_log").toPandas(),
        seen=store.read(spark, "url_seen").toPandas(),
        oracle=oracle, store=store, images=images,
        fb_path=fb_path)


def test_broadening_applied_once(broadened_run):
    store = broadened_run["store"]
    assert store.snapshot().meta.get("fallback_added") is True
    # fallback strata actually crawled: log rows exist at priority >= n_strata
    seen = broadened_run["seen"]
    assert (seen["first_seen_priority"] >= TINY.n_strata).any()


def test_broadening_ordering_parity(broadened_run):
    log = broadened_run["log"]
    admitted = log[log["admission_idx"].notna()].sort_values(
        ["epoch", "admission_idx"])
    engine_order = list(zip(admitted["epoch"].astype(int),
                            admitted["admission_idx"].astype(int),
                            admitted["url_hash"].astype(int)))
    assert engine_order == broadened_run["oracle"].golden_order()


def test_broadening_seen_parity(broadened_run):
    engine_seen = set(broadened_run["seen"]["url_hash"].tolist())
    assert engine_seen == broadened_run["oracle"].golden_seen()


def test_resume_does_not_rebroaden(spark, broadened_run):
    """A resumed run on the broadened store terminates without folding the
    fallback in a second time."""
    store = broadened_run["store"]
    log_before = store.read(spark, "crawl_log").count()
    files_before = len(store.snapshot().tables["frontier"])
    fb = spark.read.parquet(broadened_run["fb_path"])
    res = run_crawl(spark, store, broadened_run["images"], TINY_CFG,
                    max_epochs=30, fallback=fb, target_results=10 ** 9)
    assert store.snapshot().meta.get("fallback_added") is True
    # terminated on the empty streak without admitting anything new and
    # without staging any new frontier strata
    assert all(r.n_admitted == 0 and r.n_denied == 0 for r in res)
    assert len(store.snapshot().tables["frontier"]) == files_before
    assert store.read(spark, "crawl_log").count() == log_before


# ---------------------------------------------------------------------------
# S7/S8: MERGE upsert on the snapshot backend
# ---------------------------------------------------------------------------

def test_merge_into_newer_wins(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "st"))
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k int, ver int, v string")
    store.commit(epoch=-1, appends={"t": store.stage(base, "t")},
                 meta={"last_epoch": -1})

    upd = spark.createDataFrame(
        [(2, 5, "stale"), (2, 20, "newer"), (3, 1, "insert")],
        "k int, ver int, v string")
    merge_into(spark, store, "t", upd, "k", newer_col="ver")

    got = {r["k"]: (r["ver"], r["v"])
           for r in store.read(spark, "t").collect()}
    assert got == {1: (10, "a"), 2: (20, "newer"), 3: (1, "insert")}


def test_merge_into_idempotent(spark, tmp_path):
    """Re-applying the same update batch is a no-op (MERGE idempotence —
    what makes epoch replay after a crash safe on an upsert sink)."""
    store = SnapshotStore(str(tmp_path / "st"))
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k int, ver int, v string")
    store.commit(epoch=-1, appends={"t": store.stage(base, "t")},
                 meta={"last_epoch": -1})
    upd = spark.createDataFrame(
        [(2, 20, "newer"), (3, 1, "insert")], "k int, ver int, v string")
    merge_into(spark, store, "t", upd, "k", newer_col="ver")
    first = sorted(map(tuple, store.read(spark, "t").collect()))
    merge_into(spark, store, "t", upd, "k", newer_col="ver")
    second = sorted(map(tuple, store.read(spark, "t").collect()))
    assert first == second


def test_upsert_row_single(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "st"))
    base = spark.createDataFrame([(1, 10, "a")], "k int, ver int, v string")
    store.commit(epoch=-1, appends={"t": store.stage(base, "t")},
                 meta={"last_epoch": -1})

    upsert_row(spark, store, "t", {"k": 1, "ver": 5, "v": "stale"},
               "k", newer_col="ver")
    assert store.read(spark, "t").collect()[0]["v"] == "a"  # not newer

    upsert_row(spark, store, "t", {"k": 1, "ver": 30, "v": "fresh"},
               "k", newer_col="ver")
    got = {r["k"]: (r["ver"], r["v"]) for r in store.read(spark, "t").collect()}
    assert got == {1: (30, "fresh")}

    upsert_row(spark, store, "t", {"k": 2, "ver": 1, "v": "new"}, "k",
               newer_col="ver")
    assert store.read(spark, "t").count() == 2
