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
from ..operators.dedup import robots_flag
from ..operators.recrawl import recrawl_pass
from ..tables import SnapshotStore
from .epoch import EpochResult, record_failed_epoch, run_epoch


def init_run(spark: SparkSession, store: SnapshotStore, frontier: DataFrame,
             robots: DataFrame, budgets: DataFrame,
             files_per_stratum: int = 1) -> None:
    """Commit snapshot 0: frontier split by priority (file-level partition
    pruning), broadcast dims, exact per-stratum remaining counts. The
    ``robots_denied`` flag is precomputed here (enqueue-time evaluation of
    the static per-run robots dim) so epoch scheduling never needs URL
    strings before materialization."""
    frontier = robots_flag(frontier, robots)
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
    # Carry pre-init snapshot meta forward (the reference's setup order runs
    # migrations BEFORE init — migrations_applied must survive init), but
    # NOT crawl-lifecycle keys: re-initializing an existing store starts the
    # crawl state fresh (a stale fallback_added would silently disable
    # broadening on the new run).
    _CRAWL_KEYS = {"remaining_by_priority", "frontier_files_by_priority",
                   "last_epoch", "cum_terminal", "counters", "fallback_added"}
    prior_meta = {k: v for k, v in store.snapshot().meta.items()
                  if k not in _CRAWL_KEYS}
    store.commit(epoch=-1, appends=appends, replaces=replaces, meta={
        **prior_meta,
        "remaining_by_priority": {str(k): v for k, v in counts.items()},
        "frontier_files_by_priority": files_by_priority,
        "last_epoch": -1,
    })


def broaden_frontier(spark: SparkSession, store: SnapshotStore,
                     fallback: DataFrame, files_per_stratum: int = 1) -> None:
    """T9: append broader, lower-priority strata to a drained frontier — the
    analog of the reference extending its search-query list with 8 broad
    fallback queries when all strata exhaust below target
    (/root/reference/src/infrastructure/github_api.py:588-604). One atomic
    commit: new stratum files + bumped remaining counters + the
    ``fallback_added`` flag (so a resumed run never re-broadens)."""
    snap = store.snapshot()
    fallback = robots_flag(fallback, store.read(spark, "robots"))
    counts = {int(r["priority"]): int(r["n"]) for r in
              fallback.groupBy("priority").agg(F.count("*").alias("n")).collect()}
    remaining = {int(k): int(v) for k, v in
                 snap.meta.get("remaining_by_priority", {}).items()}
    files_by_p = {k: list(v) for k, v in
                  snap.meta.get("frontier_files_by_priority", {}).items()}
    appends: dict[str, list[str]] = {"frontier": []}
    for p in sorted(counts):
        part = (fallback.filter(F.col("priority") == p)
                .repartition(files_per_stratum)
                .sortWithinPartitions("host", "seq"))
        fs = store.stage(part, "frontier")
        files_by_p.setdefault(str(p), [])
        files_by_p[str(p)] = files_by_p[str(p)] + fs
        appends["frontier"].extend(fs)
        remaining[p] = remaining.get(p, 0) + counts[p]
    store.commit(
        epoch=int(snap.meta.get("last_epoch", -1)),
        appends=appends,
        meta={**snap.meta,
              "remaining_by_priority": {str(k): v for k, v in remaining.items()},
              "frontier_files_by_priority": files_by_p,
              "fallback_added": True})


def compact_frontier_strata(spark: SparkSession, store: SnapshotStore,
                            target_files: int = 1) -> int:
    """Compact the frontier WITHIN each priority's pinned file list and
    rewrite the meta pin atomically (VERDICT r4 #6). The frontier's
    file-level partition pruning (``frontier_files_by_priority``) grows by
    one file set per discovery batch / broadening — a long-running ingest
    stream would put O(batches) files behind every epoch's pop scan, and
    generic compaction rightly refuses meta-pinned tables (the rewritten
    paths would dangle). Here each oversized stratum is rewritten into
    ``target_files`` files re-clustered by (host, seq) — the same layout
    init_run/broaden_frontier stage — and the table file list AND the pin
    map are swapped in ONE commit, so no snapshot ever sees them disagree.
    Strata at or under the target keep their exact files (incremental, like
    bin-pack). Returns the number of files compacted away."""
    snap = store.snapshot()
    files_by_p = {k: list(v) for k, v in
                  snap.meta.get("frontier_files_by_priority", {}).items()}
    if not files_by_p:
        return 0
    import os
    evolved = store.needs_merge("frontier")
    reader = (spark.read.option("mergeSchema", "true") if evolved
              else spark.read)
    absorbed = 0
    new_map: dict[str, list[str]] = {}
    for p in sorted(files_by_p, key=int):
        fs = files_by_p[p]
        if len(fs) <= target_files:
            new_map[p] = fs
            continue
        df = (reader.parquet(*[os.path.join(store.root, f) for f in fs])
              .repartition(target_files)
              .sortWithinPartitions("host", "seq"))
        new_map[p] = store.stage(df, "frontier")
        absorbed += len(fs)
    if not absorbed:
        return 0
    pinned_before = {f for fs in files_by_p.values() for f in fs}
    # preserve any frontier files outside the pin map (there are none in the
    # current writers, but a foreign append must survive maintenance)
    unpinned = [f for f in snap.tables.get("frontier", [])
                if f not in pinned_before]
    ordered = [f for p in sorted(new_map, key=int)
               for f in new_map[p]] + unpinned
    # Optimistic concurrency (r6, ADVICE item 1): this commit REPLACES the
    # frontier file list and meta wholesale from the planning snapshot. If
    # anything committed in between (notably a concurrent streaming
    # fold_batch), landing the stale plan would silently clobber that
    # commit's frontier appends, pin-map entries, and discovery-cursor
    # advances — and the stream's checkpoint has moved on, so the lost
    # discoveries would never be redelivered. require_base makes the store
    # refuse; maintenance simply yields (the staged rewrite files stay
    # unreferenced for vacuum) and the next maintenance pass replans.
    from ..tables import CommitConflictError
    try:
        store.commit(epoch=snap.epoch, replaces={"frontier": ordered},
                     meta={**snap.meta, "frontier_files_by_priority": new_map},
                     require_base=snap.commit_id)
    except CommitConflictError:
        import warnings
        warnings.warn(
            "compact_frontier_strata: a concurrent commit landed between "
            "planning and publish; yielding this maintenance pass (staged "
            "rewrite files left for vacuum)")
        return 0
    return absorbed


def maintain_store(spark: SparkSession, store: SnapshotStore,
                   cfg: CrawlConfig) -> None:
    """Between-epoch table maintenance: compact every non-meta-pinned table
    above the file target, then expire old snapshots. Storage-layer only —
    identical crawl results with or without it (loop-parity-tested).

    ``url_seen`` is maintained BUCKETED (key-hash file-sets) when
    ``cfg.useen_n_buckets`` > 0: per-epoch appends are absorbed into their
    buckets incrementally, which keeps the TTL-recrawl forget
    (operators.recrawl.forget_urls) a bucket-scoped DELETE instead of an
    O(table) rewrite — the difference that matters at 10^10 seen rows."""
    snap = store.snapshot()
    for name in sorted(snap.tables):
        if name == "url_seen" and cfg.useen_n_buckets > 0:
            # first pass records the bucket spec; later passes defer to the
            # recorded one so a cfg change across resume can never crash the
            # loop on a spec mismatch (re-bucketing is an explicit offline
            # operation, not something maintenance does implicitly)
            if snap.meta.get("bucket_spec", {}).get(name):
                store.compact_bucketed(spark, name)
            else:
                store.compact_bucketed(spark, name, key="url_hash",
                                       n_buckets=cfg.useen_n_buckets)
            continue
        if (name == "frontier"
                and snap.meta.get("frontier_files_by_priority")):
            # meta-pinned stratum files need the pin-aware path: compact
            # within each priority's list and rewrite the pin in the same
            # commit (a long-running discovery stream otherwise grows the
            # pop scan by one file set per batch)
            compact_frontier_strata(
                spark, store, target_files=cfg.compact_target_files)
            continue
        try:
            store.compact(spark, name, target_files=cfg.compact_target_files,
                          small_file_bytes=cfg.compact_small_file_bytes)
        except ValueError:
            continue   # other meta-pinned tables stay as-is
    store.vacuum(keep_last=cfg.vacuum_keep_last)


def run_crawl(spark: SparkSession, store: SnapshotStore, images: DataFrame,
              cfg: CrawlConfig, max_epochs: int = 1000,
              stop_after_empty: int | None = None,
              fallback: DataFrame | None = None,
              target_results: int | None = None) -> list[EpochResult]:
    """Run epochs from the last committed snapshot until the frontier drains
    (``stop_after_empty`` consecutive zero-progress epochs), ``max_epochs``,
    or exhaustion of remaining counters. Safe to call repeatedly — it resumes
    from wherever the previous call (or a crash) left off.

    ``fallback``: optional broader frontier strata folded in ONCE, at the
    moment the crawl would otherwise terminate, iff cumulative terminal
    results are still below ``target_results`` (T9; github_api.py:588-604).
    The fold-in is recorded in snapshot meta, so resume never re-applies it.

    An epoch that raises is recorded as a ``crawl_jobs`` row with
    status='failed' + error_message before the exception propagates (T11,
    use_cases.py:168-191); no data from the failed epoch is committed and
    ``last_epoch`` does not advance, so the next call retries it.

    When ``cfg.compact_every`` > 0, every that-many epochs the append-heavy
    tables are compacted and old snapshots vacuumed (the loop is the single
    writer, so between-epoch maintenance is race-free); a 10^5-epoch crawl
    keeps O(target_files) files per table instead of O(epochs).

    When ``cfg.recrawl_every`` > 0, every that-many epochs a TTL recrawl
    pass (operators/recrawl.recrawl_pass) forgets the oldest
    terminally-crawled URLs past ``recrawl_ttl_epochs`` so the loop
    re-fetches them — a refresh crawl. Re-admissions count as progress, so
    a refresh crawl runs until ``max_epochs`` rather than terminating on a
    drained frontier (the reference's update loop likewise never
    self-terminates, use_cases.py run_update_crawl)."""
    snap = store.snapshot()
    if snap.commit_id < 0:
        raise RuntimeError("store not initialized; call init_run first")
    if stop_after_empty is None:
        # a zero-progress streak must outlast the longest backoff gate, or the
        # loop would abandon rows still waiting in the retry queue
        stop_after_empty = max(cfg.backoff_max_epochs,
                               cfg.secondary_backoff_epochs) + 1
    start = int(snap.meta.get("last_epoch", -1)) + 1
    total_terminal = int(snap.meta.get("cum_terminal", 0))
    fallback_added = bool(snap.meta.get("fallback_added", False))
    results: list[EpochResult] = []
    empty_streak = 0
    epoch = start
    while epoch < start + max_epochs:
        try:
            res = run_epoch(spark, store, images, cfg, epoch)
        except Exception as exc:
            record_failed_epoch(store, epoch, exc)
            raise
        results.append(res)
        if cfg.compact_every and (epoch + 1) % cfg.compact_every == 0:
            maintain_store(spark, store, cfg)
        n_readmitted = 0
        if cfg.recrawl_every and (epoch + 1) % cfg.recrawl_every == 0:
            n_readmitted = recrawl_pass(spark, store, cfg, epoch)
        total_terminal += res.n_terminal
        progressed = (res.n_admitted + res.n_denied + n_readmitted) > 0
        empty_streak = 0 if progressed else empty_streak + 1
        if empty_streak >= stop_after_empty:
            if (fallback is not None and not fallback_added
                    and (target_results is None
                         or total_terminal < target_results)):
                broaden_frontier(spark, store, fallback)
                fallback_added = True
                empty_streak = 0
                epoch += 1
                continue
            break
        epoch += 1
    return results
