"""applyInPandasWithState token-bucket admission vs its pure-pandas oracle:
same integer bucket state, same per-trigger admissions, deterministic order,
elapsed-trigger refill for idle hosts.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from crawlspark import datagen
from crawlspark.streaming.stateful import (simulate_token_bucket,
                                           token_bucket_admission)

SPEC = datagen.GenSpec(seed=21, n_images=40, n_urls=240, n_hosts=6,
                       n_strata=3)
COLS = ["host", "url", "url_hash", "priority", "seq"]

STREAM_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("url_hash", T.LongType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField("seq", T.LongType()),
    T.StructField("trigger_idx", T.IntegerType()),
])


def _write_chunks(ddir: str, parts: list[pd.DataFrame]) -> None:
    for i, chunk in enumerate(parts):
        chunk = chunk.copy()
        chunk["trigger_idx"] = pd.array([i] * len(chunk), dtype="int32")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False),
                       os.path.join(ddir, f"chunk-{i}.parquet"))


def _run_stream(spark, ddir: str, budgets, name: str):
    stream = (spark.readStream.schema(STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(ddir))
    q = (token_bucket_admission(stream, budgets)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


@pytest.fixture(scope="module")
def chunks(tmp_path_factory):
    pdf = datagen.gen_frontier(SPEC)[COLS].copy()
    pdf["priority"] = pdf["priority"].astype("int32")
    parts = [pdf.iloc[:80], pdf.iloc[80:160], pdf.iloc[160:]]
    ddir = str(tmp_path_factory.mktemp("disc"))
    _write_chunks(ddir, parts)
    budgets = {h: (4, 2) for h in pdf["host"].unique()}
    return dict(ddir=ddir, parts=parts, budgets=budgets)


def test_streaming_bucket_matches_oracle(spark, chunks):
    got = _run_stream(spark, chunks["ddir"], chunks["budgets"], "bucket_out")

    exp = simulate_token_bucket(chunks["parts"], chunks["budgets"])
    key = ["host", "trigger_seq", "url_hash"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) == sum(len(p) for p in chunks["parts"])
    for col in ["host", "url_hash", "priority", "seq", "admitted",
                "trigger_seq"]:
        assert got_s[col].tolist() == exp_s[col].tolist(), col


def test_bucket_never_exceeds_capacity(spark, chunks):
    got = spark.sql("SELECT * FROM bucket_out").toPandas()
    admitted = got[got["admitted"]]
    per = admitted.groupby(["host", "trigger_seq"]).size()
    assert (per <= 4).all()  # capacity
    # across a host's active span, total admissions are bounded by the
    # initial capacity plus one refill per ELAPSED trigger index
    span = got.groupby("host")["trigger_seq"].agg(["min", "max"])
    tot = admitted.groupby("host").size()
    for h, n in tot.items():
        assert n <= 4 + 2 * int(span.loc[h, "max"] - span.loc[h, "min"])


def test_idle_host_readmits_at_full_elapsed_refill(spark, tmp_path_factory):
    """A host that drains its bucket at trigger 0 and is idle for triggers
    1-2 must be credited refill x 3 elapsed triggers (capped at capacity) on
    its return at trigger 3 — under a single-refill rule only 2 of its 5
    rows would be admitted; the elapsed rule admits 4. A filler host keeps
    the intermediate triggers non-empty. Also exercises the budgets
    uniqueness guard: the dim arrives with duplicate host rows, which must
    not duplicate output rows."""
    def rows(host, trig, n, seq0):
        return pd.DataFrame({
            "host": host,
            "url": [f"http://{host}/img/img_{seq0 + i:012d}" for i in range(n)],
            "url_hash": [hash((host, seq0 + i)) % (1 << 60) for i in range(n)],
            "priority": pd.array([0] * n, dtype="int32"),
            "seq": pd.array(range(seq0, seq0 + n), dtype="int64"),
        })

    parts = [
        rows("bursty.example.com", 0, 6, 0),    # drains: 4 admitted, 2 not
        rows("filler.example.com", 1, 1, 100),
        rows("filler.example.com", 2, 1, 200),
        rows("bursty.example.com", 3, 5, 300),  # idle 3 triggers -> full bucket
    ]
    ddir = str(tmp_path_factory.mktemp("idle"))
    _write_chunks(ddir, parts)

    budgets_df = spark.createDataFrame(
        [("bursty.example.com", 4, 2), ("bursty.example.com", 4, 2),
         ("filler.example.com", 4, 2)],
        "host string, capacity int, refill_per_epoch int")
    got = _run_stream(spark, ddir, budgets_df, "idle_out")

    assert len(got) == sum(len(p) for p in parts)  # dup dim row: no fan-out
    bursty = got[got["host"] == "bursty.example.com"]
    t0 = bursty[bursty["trigger_seq"] == 0]
    t3 = bursty[bursty["trigger_seq"] == 3]
    assert int(t0["admitted"].sum()) == 4 and len(t0) == 6
    # min(capacity=4, tokens=0 + 3 elapsed * refill=2) = 4 -> full re-admit
    assert int(t3["admitted"].sum()) == 4 and len(t3) == 5

    exp = simulate_token_bucket(
        parts, {"bursty.example.com": (4, 2), "filler.example.com": (4, 2)})
    key = ["host", "trigger_seq", "url_hash"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    for col in ["host", "url_hash", "admitted", "trigger_seq"]:
        assert got_s[col].tolist() == exp_s[col].tolist(), col
