"""Measure ann_ivf's recall@10 / cost curve across nprobe (VERDICT r3 #5).

nprobe=1 is the degenerate config; the operator's real API is the
recall-vs-fraction-scanned tradeoff. This records, per nprobe in {1,2,4,8,16}:
recall@10 against the exact ann_bruteforce baseline, the fraction of the
table scored (candidate rows / total rows), and wall time — into
IVF_RECALL.json, which tools/bench_scaling.write_bench_md folds into
BENCH.md.

Usage: python tools/bench_ivf_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from crawlspark.session import get_spark
    from crawlspark.textops import ann_bruteforce, ann_ivf

    spark = get_spark()
    n_total = spark.read.parquet(f"{sf}/embeddings.parquet").count()

    t0 = time.perf_counter()
    truth = [r["vec_id"] for r in ann_bruteforce(spark, sf).collect()]
    bf_wall = round(time.perf_counter() - t0, 3)

    n_cents = (spark.read.parquet(f"{sf}/embeddings.parquet")
               .filter(F.col("vec_id") % 64 == 1).count())
    curve = []
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        got = {r["vec_id"] for r in
               ann_ivf(spark, sf, nprobe=nprobe).collect()}
        wall = round(time.perf_counter() - t0, 3)
        curve.append({
            "nprobe": nprobe,
            "recall_at_10": round(len(got & set(truth)) / len(truth), 3),
            "approx_fraction_scanned": round(min(1.0, nprobe / n_cents), 3),
            "wall_s": wall,
        })

    out = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "sf_dir": sf,
        "n_vectors": n_total,
        "bruteforce_wall_s": bf_wall,
        "curve": curve,
    }
    with open(os.path.join(REPO, "IVF_RECALL.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))

    from tools.bench_scaling import load_runs, write_bench_md
    write_bench_md(load_runs())
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
