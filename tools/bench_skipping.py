"""Measure manifest-stats file skipping (tables.files where=) on an
epoch-clustered crawl_log: build a store with many single-epoch commits,
then time an epoch-window read+filter with and without the manifest prune.

The point at 10^5 epochs: a windowed read must be O(window files), not
O(history) — the prune removes the per-file open/footer/scan cost for every
out-of-window file, which local[32] only hints at but a 1000-executor scan
of 10^8 files pays in driver listing + task scheduling + S3 GETs.

Usage: python tools/bench_skipping.py [n_epochs] [rows_per_epoch]
Appends one JSON line to stdout; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_epochs: int = 200, rows_per_epoch: int = 20_000) -> None:
    from pyspark.sql import functions as F

    from crawlspark.config import SparkTuning
    from crawlspark.session import get_spark
    from crawlspark.tables import SnapshotStore

    spark = get_spark(SparkTuning(master="local[8]", shuffle_partitions=8,
                                  driver_memory="16g",
                                  app_name="bench-skipping"))
    root = tempfile.mkdtemp(prefix="skipbench-")
    try:
        store = SnapshotStore(os.path.join(root, "store"))
        for e in range(n_epochs):
            df = (spark.range(rows_per_epoch)
                  .select((F.col("id") + e * rows_per_epoch).alias("url_hash"),
                          F.lit(e).cast("int").alias("epoch"),
                          (F.col("id") % 97).alias("host_hash"),
                          F.lit("ok").alias("status")))
            files = store.stage(df.coalesce(2), "crawl_log",
                                stats_cols=("epoch",))
            store.commit(epoch=e, appends={"crawl_log": files})
        lo, hi = n_epochs - 4, n_epochs - 1   # trailing 4-epoch window

        def run(where):
            t0 = time.perf_counter()
            df = store.read(spark, "crawl_log", where=where)
            n = (df.filter((F.col("epoch") >= lo) & (F.col("epoch") <= hi))
                 .groupBy("status").agg(F.count("*").alias("n")).collect())
            return time.perf_counter() - t0, sum(r["n"] for r in n)

        # warm the JVM/file cache on the unpruned path first (worst case for
        # the pruned run, which then cannot benefit from cold-cache bias)
        run(None)
        full_s, full_n = run(None)
        pruned_s, pruned_n = run(("epoch", lo, hi))
        assert full_n == pruned_n == 4 * rows_per_epoch, (full_n, pruned_n)
        n_full = len(store.files("crawl_log"))
        n_pruned = len(store.files("crawl_log", where=("epoch", lo, hi)))
        out = {
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
            "metric": "epoch-window read, manifest-stats prune vs full scan",
            "n_epochs": n_epochs, "rows_per_epoch": rows_per_epoch,
            "window_epochs": 4,
            "files_full": n_full, "files_pruned": n_pruned,
            "wall_full_s": round(full_s, 3), "wall_pruned_s": round(pruned_s, 3),
            "speedup": round(full_s / pruned_s, 2),
        }
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, "SKIP_BENCH.json")
        runs = []
        if os.path.exists(path):
            with open(path) as fh:
                prev = json.load(fh)
            runs = prev.get("runs", [prev] if "n_epochs" in prev else [])
        # one row per history size — the cross-size view is the point
        # (pruned wall stays flat while the full scan grows with history)
        runs = [r for r in runs if r["n_epochs"] != n_epochs] + [out]
        runs.sort(key=lambda r: r["n_epochs"])
        with open(path, "w") as fh:
            json.dump({"runs": runs}, fh, indent=2)
        print(json.dumps(out))
        from tools.bench_scaling import load_runs, write_bench_md
        write_bench_md(load_runs())
        print("wrote BENCH.md")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
