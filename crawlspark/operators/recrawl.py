"""Forget-for-recrawl: remove URLs from the persistent seen set (S6's
action side; ref: the reference re-crawls stale rows by re-fetching ids it
pops from ``get_repositories_for_update`` and relies on upsert semantics,
/root/reference/src/infrastructure/database.py — its in-memory
``seen_repo_ids`` set can simply ``discard``; a distributed negative cache
cannot, which is why the cuckoo backend exists).

``forget_urls`` makes a set of URLs eligible again in ONE atomic commit:

* ``url_seen``      — exact ground truth: anti-join the targets out
  (wholesale replace here; on Iceberg this is a ``DELETE WHERE`` — the
  snapshot manifest supports per-file replaces, same note as merge_into);
* ``seen_filter``   — backend-dependent:
  - cuckoo: ``deleted_buckets`` clears one fingerprint per target —
    O(targets), touching only their buckets (the delete-capable filter's
    whole point);
  - bloom: bits are shared so nothing can be cleared without false
    negatives for OTHER urls — the touched buckets are REBUILT from the
    remaining seen rows (O(bucket), correct but strictly costlier; the
    trade tools/bench_cuckoo.py measures).

Either way the filter stays a strict superset of ``url_seen`` (FP-safe:
a stale maybe-seen only costs the exact check, which now misses, so the
URL is re-admitted; a false negative is impossible by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..tables import SnapshotStore
from . import bloom as bloom_ops
from . import cuckoo as cuckoo_ops


def forget_urls(spark: SparkSession, store: SnapshotStore, cfg: CrawlConfig,
                targets: DataFrame, epoch: int) -> int:
    """Remove ``targets`` (needs ``url_hash``; ``host_hash`` joined in from
    url_seen if absent) from the seen set + negative cache atomically.
    Returns the number of url_seen rows removed."""
    url_seen = store.read(spark, "url_seen")
    if url_seen is None:
        return 0
    snap = store.snapshot()
    keys = targets.select("url_hash").dropDuplicates(["url_hash"])

    hit = url_seen.join(keys, "url_hash", "left_semi").cache()
    n_forgotten = hit.count()
    if n_forgotten == 0:
        hit.unpersist()
        return 0
    remaining = url_seen.join(keys, "url_hash", "left_anti")
    replaces = {"url_seen": store.stage(remaining, "url_seen")}

    appends: dict = {}
    seen_filter = store.read(spark, "seen_filter")
    if cfg.use_bloom and seen_filter is not None:
        if cfg.seen_filter_backend == "cuckoo":
            flt_new = cuckoo_ops.deleted_buckets(
                hit.select("url_hash", "host_hash"), seen_filter,
                cfg.n_filter_buckets, cfg.cuckoo_slots_per_row, epoch)
        else:
            touched = sorted(
                r["bucket"] for r in hit.select(
                    F.pmod(F.col("host_hash"), F.lit(cfg.n_filter_buckets))
                    .cast("int").alias("bucket")).distinct().collect())
            flt_new = bloom_ops.rebuild_buckets(
                remaining.select("url_hash", "host_hash"), touched,
                cfg.n_filter_buckets, cfg.bloom_num_hashes,
                cfg.bloom_bits_per_item, epoch, min_bits=cfg.bloom_min_bits)
        staged = store.stage(flt_new, "seen_filter")
        if staged:
            appends["seen_filter"] = staged

    store.commit(epoch, appends=appends, replaces=replaces, meta={
        **snap.meta,
        "last_forget": {"epoch": epoch, "n_forgotten": n_forgotten},
    })
    hit.unpersist()
    return n_forgotten
