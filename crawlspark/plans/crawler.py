"""Multi-epoch crawl driver: init, epoch loop, resume, termination.

Maps the reference's job lifecycle (T1/T2/T7/T8/T11 in SURVEY.md §2.8):

* ``init_run``   — stage the frontier one file-set per priority stratum
                   (manual partition pruning, analog of the ordered strata
                   list /root/reference/src/infrastructure/github_api.py:221-462),
                   robots + budget dims, and commit snapshot 0.
* ``run_crawl``  — epoch loop; each epoch is one atomic snapshot commit, so a
                   kill between epochs resumes exactly (analog of last_cursor
                   checkpointing, /root/reference/src/application/use_cases.py:68-74).
* termination    — K consecutive epochs with zero progress (analog of the
                   empty-page / stratum-exhaustion logic, github_api.py:562-581).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..tables import SnapshotStore
from .epoch import EpochResult, run_epoch


def init_run(spark: SparkSession, store: SnapshotStore, frontier: DataFrame,
             robots: DataFrame, budgets: DataFrame,
             files_per_stratum: int = 1) -> None:
    """Commit snapshot 0: frontier split by priority (file-level partition
    pruning), broadcast dims, exact per-stratum remaining counts."""
    counts = {int(r["priority"]): int(r["n"]) for r in
              frontier.groupBy("priority").agg(F.count("*").alias("n")).collect()}
    appends: dict[str, list[str]] = {"frontier": []}
    files_by_priority: dict[str, list[str]] = {}
    for p in sorted(counts):
        part = (frontier.filter(F.col("priority") == p)
                .repartition(files_per_stratum)
                .sortWithinPartitions("host", "seq"))
        fs = store.stage(part, "frontier")
        files_by_priority[str(p)] = fs
        appends["frontier"].extend(fs)
    appends["robots"] = store.stage(robots, "robots")
    replaces = {"politeness_budget": store.stage(budgets, "politeness_budget")}
    store.commit(epoch=-1, appends=appends, replaces=replaces, meta={
        "remaining_by_priority": {str(k): v for k, v in counts.items()},
        "frontier_files_by_priority": files_by_priority,
        "last_epoch": -1,
    })


def run_crawl(spark: SparkSession, store: SnapshotStore, images: DataFrame,
              cfg: CrawlConfig, max_epochs: int = 1000,
              stop_after_empty: int | None = None) -> list[EpochResult]:
    """Run epochs from the last committed snapshot until the frontier drains
    (``stop_after_empty`` consecutive zero-progress epochs), ``max_epochs``,
    or exhaustion of remaining counters. Safe to call repeatedly — it resumes
    from wherever the previous call (or a crash) left off."""
    snap = store.snapshot()
    if snap.commit_id < 0:
        raise RuntimeError("store not initialized; call init_run first")
    if stop_after_empty is None:
        # a zero-progress streak must outlast the longest backoff gate, or the
        # loop would abandon rows still waiting in the retry queue
        stop_after_empty = max(cfg.backoff_max_epochs,
                               cfg.secondary_backoff_epochs) + 1
    start = int(snap.meta.get("last_epoch", -1)) + 1
    results: list[EpochResult] = []
    empty_streak = 0
    for epoch in range(start, start + max_epochs):
        res = run_epoch(spark, store, images, cfg, epoch)
        results.append(res)
        progressed = (res.n_admitted + res.n_denied) > 0
        empty_streak = 0 if progressed else empty_streak + 1
        if empty_streak >= stop_after_empty:
            break
    return results
