"""applyInPandasWithState token-bucket admission vs its pure-pandas oracle:
same integer bucket state, same per-trigger admissions, deterministic order.
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
])


@pytest.fixture(scope="module")
def chunks(tmp_path_factory):
    pdf = datagen.gen_frontier(SPEC)[COLS].copy()
    pdf["priority"] = pdf["priority"].astype("int32")
    parts = [pdf.iloc[:80], pdf.iloc[80:160], pdf.iloc[160:]]
    ddir = str(tmp_path_factory.mktemp("disc"))
    for i, chunk in enumerate(parts):
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False),
                       os.path.join(ddir, f"chunk-{i}.parquet"))
    budgets = {h: (4, 2) for h in pdf["host"].unique()}
    return dict(ddir=ddir, parts=parts, budgets=budgets)


def test_streaming_bucket_matches_oracle(spark, chunks):
    stream = (spark.readStream.schema(STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(chunks["ddir"]))
    out_name = "bucket_out"
    q = (token_bucket_admission(stream, chunks["budgets"])
         .writeStream.format("memory").queryName(out_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql(f"SELECT * FROM {out_name}").toPandas()

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
    # across consecutive triggers a host can admit at most capacity + refill
    tot = admitted.groupby("host").size()
    n_triggers = got.groupby("host")["trigger_seq"].nunique()
    for h, n in tot.items():
        assert n <= 4 + 2 * (n_triggers[h] - 1)