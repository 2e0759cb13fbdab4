"""Fetch simulation + payload validation (V3/V4/V5 in SURVEY.md §2.9).

Fetch outcomes are a deterministic integer mix of (url_hash, attempt, epoch)
— the analog of the reference's transient ClientError/Timeout retries
(tenacity, /root/reference/src/infrastructure/github_api.py:70-74) and
secondary-rate-limit deferrals (github_api.py:103-108). Successful fetches
read the payload row from the image+caption table (which plays the web) and
validate the per-row invariant from BASELINE.json input_hint:

  * decoded-pixel fidelity: exact for lossless fmt, PSNR >= 40 dB for lossy
  * caption exact equality (vs the deterministic caption for the image_id)
  * phash recompute equality

All heavy work is Arrow-batched pandas UDFs over the shared numpy codecs in
``crawlspark.codecs`` — no per-row Python at the Spark boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs
from ..config import CrawlConfig, fetch_outcome_per_mille_np

# outcome codes (deterministic draw r in [0,1000))
OUTCOME_RETRY = "retry"        # r <  transient_fail_per_mille
OUTCOME_DEFERRED = "deferred"  # r in [transient, transient+secondary)
OUTCOME_FETCHED = "fetched"    # else


def outcome_col(cfg: CrawlConfig, epoch: int):
    """Column expr: deterministic fetch outcome for (url_hash, attempt)."""

    @F.pandas_udf("string")
    def _outcome(url_hash: pd.Series, attempt: pd.Series) -> pd.Series:
        r = fetch_outcome_per_mille_np(url_hash.to_numpy(),
                                       attempt.to_numpy(), epoch)
        out = np.where(
            r < cfg.transient_fail_per_mille, OUTCOME_RETRY,
            np.where(
                r < cfg.transient_fail_per_mille + cfg.secondary_limit_per_mille,
                OUTCOME_DEFERRED, OUTCOME_FETCHED))
        return pd.Series(out)

    return _outcome(F.col("url_hash"), F.col("attempt"))


_VALIDATE_TYPE = T.StructType([
    T.StructField("psnr_db", T.DoubleType()),
    T.StructField("caption_ok", T.BooleanType()),
    T.StructField("phash_ok", T.BooleanType()),
    T.StructField("valid", T.BooleanType()),
])


@F.pandas_udf(_VALIDATE_TYPE)
def validate_payload(image_id: pd.Series, buf: pd.Series, fmt: pd.Series,
                     w: pd.Series, h: pd.Series, caption: pd.Series,
                     phash: pd.Series) -> pd.DataFrame:
    """Arrow-batched payload validation. psnr_db is NULL for lossless formats
    (FIXTURES.md crawl_log schema); a missing payload (NULL bytes) is invalid."""
    n = len(image_id)
    psnr = np.full(n, np.nan)
    cap_ok = np.zeros(n, dtype=bool)
    ph_ok = np.zeros(n, dtype=bool)
    valid = np.zeros(n, dtype=bool)
    for i in range(n):
        b = buf.iloc[i]
        if b is None or fmt.iloc[i] is None:
            continue
        f = fmt.iloc[i]
        iid = image_id.iloc[i]
        wi, hi = int(w.iloc[i]), int(h.iloc[i])
        try:
            dec = codecs.decode_image(bytes(b), f, wi, hi)
        except Exception:
            continue
        ref = codecs.make_pixels(iid, wi, hi)
        if codecs.is_lossless(f):
            pix_ok = bool(np.array_equal(dec, ref))
        else:
            p = codecs.psnr_db(ref, dec)
            psnr[i] = p
            pix_ok = bool(p >= 40.0)
        cap_ok[i] = codecs.make_caption(iid) == caption.iloc[i]
        ph_ok[i] = codecs.phash64(dec) == int(phash.iloc[i])
        valid[i] = pix_ok and cap_ok[i] and ph_ok[i]
    return pd.DataFrame({
        "psnr_db": psnr, "caption_ok": cap_ok, "phash_ok": ph_ok,
        "valid": valid,
    })


def fetch_and_validate(fetched: DataFrame, images: DataFrame) -> DataFrame:
    """Join the admitted+fetched rows against the image+caption table (the
    simulated web) and validate. The popped batch is tiny relative to the
    image table, so it is the broadcast side — the image scan then prunes to
    matching row groups instead of shuffling 100 TB."""
    batch = fetched.select("url_hash", "url", "host", "host_hash", "priority",
                           "seq", "image_id", "attempt", "admission_idx")
    payload = images.join(
        F.broadcast(batch), "image_id", "inner")
    v = payload.withColumn(
        "_v",
        validate_payload(
            F.col("image_id"), F.col("bytes"), F.col("fmt"), F.col("w"),
            F.col("h"), F.col("caption"), F.col("phash")))
    missing = batch.join(images.select("image_id"), "image_id", "left_anti") \
        .select("url_hash", "url", "host", "host_hash", "priority", "seq",
                "image_id", "attempt", "admission_idx",
                F.lit(None).cast("double").alias("psnr_db"),
                F.lit(None).cast("boolean").alias("caption_ok"),
                F.lit(None).cast("boolean").alias("phash_ok"),
                F.lit(False).alias("valid"))
    present = v.select(
        "url_hash", "url", "host", "host_hash", "priority", "seq", "image_id",
        "attempt", "admission_idx",
        F.col("_v.psnr_db").alias("psnr_db"),
        F.col("_v.caption_ok").alias("caption_ok"),
        F.col("_v.phash_ok").alias("phash_ok"),
        F.col("_v.valid").alias("valid"))
    return present.unionByName(missing)
