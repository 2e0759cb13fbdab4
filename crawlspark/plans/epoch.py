"""One crawl epoch as a single DataFrame job (SURVEY.md §7 M1/M2/M3).

The reference's async page loop (/root/reference/src/infrastructure/
github_api.py:467-686 driving /root/reference/src/application/
use_cases.py:77-141) becomes a deterministic batch pipeline:

  pruned frontier scan ∪ retries
    -> supersede (one row per url_hash; retry copy wins)        [J2/J3]
    -> bloom probe + exact anti-join vs url_seen                [V2/J2]
    -> robots split (broadcast dim)                             [north_rule]
    -> backoff gate (not_before_epoch <= epoch)                 [T4/T5]
    -> token-bucket admission, global (priority, seq) order     [O1/T3]
    -> deterministic fetch outcomes                             [T5/T6]
    -> payload validation vs the image+caption table            [V4/V5]
    -> ONE atomic commit: crawl_log, url_seen, retries,
       seen_filter, epoch_metrics, crawl_jobs(+meta), budgets   [S7/S13/T11]

Scale levers (explicit, per north_rule):
  * **priority partition pruning** — the frontier is stored one file-set per
    stratum; an epoch reads only the shortest stratum prefix whose remaining
    row budget covers 2x batch_size (the prefix rule is part of the defined
    semantics: the oracle applies the identical rule, so parity holds).
    The rest of a 10^10-row frontier is never touched.
  * **salted two-phase per-host top-k** in admission (politeness.admit),
    with **late materialization**: the admission shuffles carry compact
    hashed keys only; URL/host strings rejoin via a broadcast join of the
    admitted key set (politeness.admit_late_materialized).
  * **bloom negative-cache** in front of the exact seen anti-join.
  * budgets and robots are **broadcast**; the popped batch is broadcast into
    the image-table join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig, choose_prefix
from ..operators import bloom as bloom_ops
from ..operators import cuckoo as cuckoo_ops
from ..operators import dedup, politeness
from ..operators.validate import (OUTCOME_DEFERRED, OUTCOME_FETCHED,
                                  OUTCOME_RETRY, fetch_and_validate,
                                  outcome_col)
from ..tables import SnapshotStore

BASE_TS = "2026-01-01 00:00:00"

LOG_COLS = ["epoch", "admission_idx", "url_hash", "url", "host", "image_id",
            "status", "attempt", "psnr_db", "caption_ok", "phash_ok",
            "fetched_at"]

FRONTIER_COLS = ["url", "url_hash", "host", "host_hash", "priority", "seq",
                 "image_id", "attempt", "not_before_epoch", "discovered_at"]

# scheduling columns (~36 B/row): everything up to admission runs on these
COMPACT_COLS = ["url_hash", "host_hash", "priority", "seq", "attempt",
                "not_before_epoch"]
# string/payload columns read back only for the admitted + denied key set
MATERIAL_COLS = ["url_hash", "url", "host", "image_id", "discovered_at"]


def _job_schema():
    """Fixed arrow schema for crawl_jobs rows: completed and failed rows must
    stay column-compatible (the table is read as one parquet file set)."""
    import pyarrow as pa

    return pa.schema([
        ("job_id", pa.int64()), ("epoch", pa.int64()),
        ("status", pa.string()),
        ("records_processed", pa.int64()), ("records_created", pa.int64()),
        ("records_updated", pa.int64()), ("input_files", pa.string()),
        ("error_message", pa.string()),
    ])


def record_failed_epoch(store: SnapshotStore, epoch: int,
                        error: BaseException | str) -> None:
    """T11 failure half: persist a crawl_jobs row with status='failed' +
    error_message WITHOUT committing any data appends, so a user inspecting
    crawl_jobs can tell crash from not-run while resumability is untouched
    (ref: use_cases.py:168-191 finalizes status=failed with error_message;
    database.py:396-419 persists it). Meta is carried over unchanged —
    last_epoch does not advance, so the next run_crawl retries this epoch."""
    snap = store.snapshot()
    job_row = pd.DataFrame([{
        "job_id": epoch, "epoch": epoch, "status": "failed",
        "records_processed": 0, "records_created": 0, "records_updated": 0,
        "input_files": "", "error_message": str(error)[:1000],
    }])
    store.commit(
        epoch,
        appends={"crawl_jobs": store.stage_pandas(job_row, "crawl_jobs",
                                                  schema=_job_schema())},
        meta=snap.meta)


@dataclass
class EpochResult:
    epoch: int
    n_candidates: int = 0
    n_admitted: int = 0
    n_denied: int = 0
    n_ok: int = 0
    n_invalid: int = 0
    n_retry: int = 0
    n_deferred: int = 0
    n_failed: int = 0
    p_max: int = 0
    remaining_by_priority: dict = field(default_factory=dict)

    @property
    def n_terminal(self) -> int:
        return self.n_ok + self.n_invalid + self.n_failed + self.n_denied


def _ts(epoch: int):
    return F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=F.lit(epoch))


def run_epoch(spark: SparkSession, store: SnapshotStore, images: DataFrame,
              cfg: CrawlConfig, epoch: int) -> EpochResult:
    snap = store.snapshot()
    remaining = {int(k): int(v)
                 for k, v in snap.meta.get("remaining_by_priority", {}).items()}
    frontier_files = snap.meta.get("frontier_files_by_priority", {})

    p_max = choose_prefix(remaining, cfg.batch_size)
    files = []
    for p in sorted(int(k) for k in frontier_files):
        if p <= p_max and remaining.get(p, 0) > 0:
            files.extend(frontier_files[str(p)])
    res = EpochResult(epoch=epoch, p_max=p_max, remaining_by_priority=dict(remaining))

    import os
    # -- COMPACT scheduling read: every stage up to admission runs on hashed
    # keys + small ints only (parquet column pruning keeps URL/host strings
    # on disk); strings are read back below for the admitted + denied rows
    # only. robots_denied was precomputed at enqueue time (crawler.init_run /
    # ingest fold-in / broadening — the robots dim is static per run).
    frontier_paths = [os.path.join(store.root, f) for f in files]
    pending = None
    if files:
        pending = (spark.read.parquet(*frontier_paths)
                   .select(*COMPACT_COLS, "robots_denied")
                   .withColumn("src", F.lit("frontier")))
    retries_raw = store.read(spark, "retries")
    if retries_raw is not None:
        retries = (retries_raw
                   .select(*COMPACT_COLS)
                   # re-enqueued rows were robots-allowed by construction
                   .withColumn("robots_denied", F.lit(False))
                   .withColumn("src", F.lit("retry")))
        pending = retries if pending is None else pending.unionByName(retries)
    if pending is None:
        return res

    url_seen = store.read(spark, "url_seen")
    seen_filter = store.read(spark, "seen_filter")
    budgets = store.read(spark, "politeness_budget")

    cand = dedup.supersede(pending)
    cand = dedup.not_seen(cand, url_seen, seen_filter, cfg)
    cand = cand.filter(F.col("attempt") < cfg.max_attempts)
    denied_c = cand.filter(F.col("robots_denied"))
    allowed = cand.filter(~F.col("robots_denied"))
    gated = allowed.filter(F.col("not_before_epoch") <= epoch)

    admitted_c = politeness.admit_late_materialized(
        gated, budgets, epoch, cfg.batch_size)

    # -- string materialization: second column-pruned scan of the same
    # frontier files (+ the small retries table), semi-joined down to the
    # admitted + denied key set. At scale this reads string columns for a
    # few percent of the slice instead of shuffling them through the dedup
    # agg and both admission sorts.
    need = (admitted_c.select("url_hash")
            .unionByName(denied_c.select("url_hash")))
    # the supersede order columns (small ints) ride along so the duplicate-
    # copy dedupe below picks the SAME winner dedup.supersede picked
    mat_cols = MATERIAL_COLS + ["attempt", "not_before_epoch",
                                "priority", "seq"]
    strings = None
    if files:
        strings = spark.read.parquet(*frontier_paths).select(*mat_cols)
    if retries_raw is not None:
        rs = retries_raw.select(*mat_cols)
        strings = rs if strings is None else strings.unionByName(rs)
    # duplicate frontier copies share url_hash but canonicalization twins
    # differ in raw url/discovered_at — collapse deterministically with the
    # supersede winner rule (max_by over the shared lexicographic key), so
    # the materialized strings always match the row admission scheduled
    strings = (strings.join(need, "url_hash", "left_semi")
               .groupBy("url_hash")
               .agg(F.max_by(F.struct(*MATERIAL_COLS), dedup.supersede_key())
                    .alias("_w"))
               .select("_w.*"))

    denied = denied_c.join(strings, "url_hash").persist()
    admitted = admitted_c.join(strings, "url_hash").persist()

    out = admitted.withColumn("outcome", outcome_col(cfg, epoch)).persist()
    fetched = out.filter(F.col("outcome") == OUTCOME_FETCHED)
    transient = out.filter(F.col("outcome") == OUTCOME_RETRY)
    deferred = out.filter(F.col("outcome") == OUTCOME_DEFERRED)

    validated = fetch_and_validate(fetched, images).persist()

    # ---- crawl_log -----------------------------------------------------
    def _log(df, status_col, admission=True, psnr=None):
        return df.select(
            F.lit(epoch).cast("int").alias("epoch"),
            (F.col("admission_idx").cast("long") if admission
             else F.lit(None).cast("long")).alias("admission_idx"),
            "url_hash", "url", "host", "image_id",
            status_col.alias("status"),
            F.col("attempt").cast("int").alias("attempt"),
            (psnr if psnr is not None else F.lit(None).cast("double")).alias("psnr_db"),
            (F.col("caption_ok") if psnr is not None else F.lit(None).cast("boolean")).alias("caption_ok"),
            (F.col("phash_ok") if psnr is not None else F.lit(None).cast("boolean")).alias("phash_ok"),
            _ts(epoch).alias("fetched_at"),
        )

    log_ok = _log(validated,
                  F.when(F.col("valid"), F.lit("ok")).otherwise(F.lit("invalid_payload")),
                  psnr=F.when(F.isnan(F.col("psnr_db")), F.lit(None).cast("double"))
                        .otherwise(F.col("psnr_db")))  # NULL for lossless fmts
    will_fail = transient.filter(F.col("attempt") + 1 >= cfg.max_attempts)
    will_retry = transient.filter(F.col("attempt") + 1 < cfg.max_attempts)
    log_parts = [
        log_ok,
        _log(will_fail, F.lit("failed")),
        _log(will_retry, F.lit("retry")),
        _log(deferred, F.lit("deferred")),
        _log(denied, F.lit("robots_denied"), admission=False),
    ]
    crawl_log = log_parts[0]
    for part in log_parts[1:]:
        crawl_log = crawl_log.unionByName(part)
    crawl_log = crawl_log.persist()

    # ---- new seen rows (terminal statuses: ok/invalid/failed/robots) -----
    def _seen(df):
        return df.select(
            "url_hash", "host_hash",
            F.lit(epoch).cast("int").alias("first_seen_epoch"),
            F.col("priority").cast("int").alias("first_seen_priority"))

    new_seen = (_seen(validated)
                .unionByName(_seen(will_fail))
                .unionByName(_seen(denied)))

    # ---- retry / deferral re-enqueue ------------------------------------
    backoff_expr = F.least(
        F.lit(cfg.backoff_max_epochs),
        F.greatest(F.lit(cfg.backoff_min_epochs),
                   F.expr("shiftleft(1, attempt)")))  # 1 << (new_attempt-1)
    re_retry = will_retry.select(
        "url", "url_hash", "host", "host_hash", "priority", "seq", "image_id",
        (F.col("attempt") + 1).cast("int").alias("attempt"),
        (F.lit(epoch) + backoff_expr).cast("int").alias("not_before_epoch"),
        "discovered_at")
    re_defer = deferred.select(
        "url", "url_hash", "host", "host_hash", "priority", "seq", "image_id",
        F.col("attempt").cast("int").alias("attempt"),
        F.lit(epoch + cfg.secondary_backoff_epochs).cast("int").alias("not_before_epoch"),
        "discovered_at")
    new_retries = re_retry.unionByName(re_defer)

    # retries COMPACTION: the table is REPLACED each epoch with the live set
    # (new re-enqueues + prior rows not superseded / not terminal / not
    # admitted) instead of appended to — otherwise retry state grows without
    # bound across a long crawl. The kept-row rule is the oracle's exactly
    # (oracle/simulator.py run_epoch tail); the table stays O(active backoff
    # rows), so the per-epoch rewrite is a small bounded job (same pattern as
    # the politeness_budget replace).
    retries_next = new_retries
    if retries_raw is not None:
        seen_hashes = new_seen.select("url_hash")
        if url_seen is not None:
            seen_hashes = seen_hashes.unionByName(url_seen.select("url_hash"))
        kept = (retries_raw
                .join(new_retries.select("url_hash"), "url_hash", "left_anti")
                .join(seen_hashes, "url_hash", "left_anti")
                .join(admitted.select("url_hash"), "url_hash", "left_anti")
                .select(*FRONTIER_COLS))
        retries_next = new_retries.select(*FRONTIER_COLS).unionByName(kept)

    # ---- budgets ---------------------------------------------------------
    budgets_next = politeness.next_budgets(
        budgets, admitted, deferred.select("host"), epoch,
        cfg.secondary_backoff_epochs)

    # ---- counters --------------------------------------------------------
    status_counts = {r["status"]: r["n"] for r in
                     crawl_log.groupBy("status").agg(F.count("*").alias("n")).collect()}
    res.n_ok = status_counts.get("ok", 0)
    res.n_invalid = status_counts.get("invalid_payload", 0)
    res.n_retry = status_counts.get("retry", 0)
    res.n_deferred = status_counts.get("deferred", 0)
    res.n_failed = status_counts.get("failed", 0)
    res.n_denied = status_counts.get("robots_denied", 0)
    res.n_admitted = res.n_ok + res.n_invalid + res.n_retry + res.n_deferred + res.n_failed

    # remaining decrement: frontier-sourced rows that left their stratum
    consumed = (out.filter(F.col("src") == "frontier").groupBy("priority")
                .agg(F.count("*").alias("n"))
                .unionByName(denied.filter(F.col("src") == "frontier")
                             .groupBy("priority").agg(F.count("*").alias("n")))
                .groupBy("priority").agg(F.sum("n").alias("n")).collect())
    for r in consumed:
        p = int(r["priority"])
        remaining[p] = max(0, remaining.get(p, 0) - int(r["n"]))
    res.remaining_by_priority = remaining

    # ---- per-partition lineage + metrics (T12) ---------------------------
    metrics = (crawl_log
               .withColumn("host_bucket",
                           F.pmod(F.xxhash64("host"), F.lit(cfg.n_filter_buckets)).cast("int"))
               .withColumn("partition_id", F.spark_partition_id())
               .groupBy("partition_id", "host_bucket")
               .agg(F.count("*").alias("n_popped"),
                    F.sum(F.when(F.col("status").isin("ok", "invalid_payload"), 1)
                          .otherwise(0)).alias("n_fetched"),
                    F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_valid"))
               .withColumn("epoch", F.lit(epoch).cast("int")))

    # ---- stage + single atomic commit -------------------------------------
    appends = {}
    # crawl_log is append-per-epoch, so each file's [min,max] epoch bound is
    # a single point — manifest stats make any epoch-windowed read of the
    # log O(window files), not O(history) (tables.files where=)
    appends["crawl_log"] = store.stage(crawl_log, "crawl_log",
                                       stats_cols=("epoch",))
    appends["url_seen"] = store.stage(new_seen, "url_seen")
    appends["epoch_metrics"] = store.stage(metrics, "epoch_metrics")
    if cfg.use_bloom:
        # all_seen (prior url_seen + this epoch's rows) feeds the saturation
        # rebuild path only — touched iff a bucket's FPP crossed the threshold
        all_seen = new_seen.select("url_hash", "host_hash")
        if url_seen is not None:
            all_seen = (url_seen.select("url_hash", "host_hash")
                        .unionByName(all_seen))
        if cfg.seen_filter_backend == "cuckoo":
            flt_new = cuckoo_ops.updated_buckets(
                new_seen, seen_filter, cfg.n_filter_buckets,
                cfg.cuckoo_slots_per_row, epoch, min_rows=cfg.cuckoo_min_rows,
                all_seen=all_seen, load_rebuild=cfg.cuckoo_load_rebuild)
        else:
            flt_new = bloom_ops.updated_buckets(
                new_seen, seen_filter, cfg.n_filter_buckets, cfg.bloom_num_hashes,
                cfg.bloom_bits_per_item, epoch, min_bits=cfg.bloom_min_bits,
                all_seen=all_seen, fpp_rebuild=cfg.bloom_fpp_rebuild)
        fltf = store.stage(flt_new, "seen_filter")
        if fltf:
            appends["seen_filter"] = fltf

    job_row = pd.DataFrame([{
        "job_id": epoch, "epoch": epoch, "status": "completed",
        "records_processed": res.n_admitted + res.n_denied,
        "records_created": res.n_ok,
        "records_updated": res.n_invalid + res.n_failed,
        "input_files": ",".join(files),
        "error_message": None,
    }])
    appends["crawl_jobs"] = store.stage_pandas(job_row, "crawl_jobs",
                                               schema=_job_schema())
    replaces = {
        "politeness_budget": store.stage(budgets_next, "politeness_budget"),
        "retries": store.stage(retries_next, "retries"),
    }

    # carry prior meta keys (fallback_added, discovery bookkeeping, ...)
    # forward — an epoch commit must never drop another component's state
    store.commit(epoch, appends=appends, replaces=replaces, meta={
        **snap.meta,
        "remaining_by_priority": {str(k): v for k, v in remaining.items()},
        "frontier_files_by_priority": frontier_files,
        "last_epoch": epoch,
        "cum_terminal": int(snap.meta.get("cum_terminal", 0)) + res.n_terminal,
        "counters": {"ok": res.n_ok, "invalid": res.n_invalid,
                     "retry": res.n_retry, "deferred": res.n_deferred,
                     "failed": res.n_failed, "denied": res.n_denied},
    })

    for df in (denied, admitted, out, validated, crawl_log):
        df.unpersist()
    return res
