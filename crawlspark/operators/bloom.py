r"""Partitioned bloom URL-seen filter (V2 in SURVEY.md §2.9; north_rule).

The reference keeps an in-memory Python set of seen ids
(/root/reference/src/infrastructure/github_api.py:463,548-555). At 10^10 URLs
an exact set probe per candidate means a full shuffle against the url_seen
table every epoch; the bloom filter is a *negative cache* that lets the bulk
of genuinely-new URLs skip that shuffle:

  candidates --cogroup probe--> definitely-new  ----------------+--> union
                           \--> maybe-seen --exact left_anti ---+

False positives only cost an extra exact check; false negatives are impossible
(bits only ever turn on), so no URL can be dropped (SURVEY.md §7 hard part 3).

State: one row per bucket ``(bucket=pmod(host_hash, N), bits:binary,
n_items:int64, epoch:int32)``, appended per epoch (only touched buckets);
readers take the latest row per bucket. Probe and update run as
``cogroup(...).applyInPandas`` so each bucket's bit array crosses the Arrow
boundary once per task, never once per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILTER_SCHEMA = "bucket int, bits binary, n_items long, epoch int"
_PROBE_SCHEMA = "url_hash long, maybe_seen boolean"

# independent bit positions via splitmix-style remix of the 60-bit url hash
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions for each hash; double hashing h1 + i*h2 mod m."""
    with np.errstate(over="ignore"):
        x = hashes.astype(np.uint64)
        h1 = (x ^ (x >> np.uint64(33))) * _MIX1
        h1 = h1 ^ (h1 >> np.uint64(29))
        h2 = (x * _MIX2) ^ (x >> np.uint64(31))
        h2 = h2 | np.uint64(1)  # odd, so strides cover the table
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)
    return pos


def _probe_bits(bits: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    m_bits = bits.size * 8
    pos = _positions(hashes, k, m_bits)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit_idx = (pos & np.uint64(7)).astype(np.uint8)
    hit = (bits[byte_idx] >> bit_idx) & 1
    return hit.all(axis=1)


def _set_bits(bits: np.ndarray, hashes: np.ndarray, k: int) -> None:
    m_bits = bits.size * 8
    pos = _positions(hashes, k, m_bits)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64).ravel()
    bit_idx = (pos & np.uint64(7)).astype(np.uint8).ravel()
    np.bitwise_or.at(bits, byte_idx, np.uint8(1) << bit_idx)


def latest_filter(filters: DataFrame | None) -> DataFrame | None:
    """Collapse the append-only filter table to the newest row per bucket."""
    if filters is None:
        return None
    w = Window.partitionBy("bucket").orderBy(F.desc("epoch"))
    return (filters.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def probe(candidates: DataFrame, filters: DataFrame | None,
          n_buckets: int, num_hashes: int) -> DataFrame:
    """Adds boolean ``maybe_seen`` to candidates (keyed by ``url_hash`` and
    ``host_hash``). With no filter state yet, everything is definitely new."""
    if filters is None:
        return candidates.withColumn("maybe_seen", F.lit(False))
    k = num_hashes
    cand_b = candidates.withColumn("bucket",
                                   F.pmod(F.col("host_hash"), F.lit(n_buckets)).cast("int"))
    flt = latest_filter(filters)

    def _probe(cand_pdf: pd.DataFrame, flt_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame({"url_hash": pd.Series(dtype="int64"),
                                 "maybe_seen": pd.Series(dtype="bool")})
        hashes = cand_pdf["url_hash"].to_numpy()
        if flt_pdf.empty:
            seen = np.zeros(len(cand_pdf), dtype=bool)
        else:
            bits = np.frombuffer(flt_pdf["bits"].iloc[0], dtype=np.uint8)
            seen = _probe_bits(bits, hashes, k)
        return pd.DataFrame({"url_hash": hashes, "maybe_seen": seen})

    probed = (cand_b.select("bucket", "url_hash").groupBy("bucket")
              .cogroup(flt.groupBy("bucket"))
              .applyInPandas(_probe, schema=_PROBE_SCHEMA)
              .dropDuplicates(["url_hash"]))
    return candidates.join(probed, "url_hash", "left").na.fill({"maybe_seen": False})


def saturated_buckets(new_seen: DataFrame, filters: DataFrame,
                      n_buckets: int, num_hashes: int,
                      threshold: float) -> list[int]:
    """Buckets whose post-update FPP estimate would exceed ``threshold``:
    per-bucket new-item counts joined against the current filter state, the
    standard bloom FPP ``(1 - e^(-k*n/m))^k`` evaluated as JVM exprs. The
    result is driver bookkeeping (<= n_buckets rows) steering THIS commit's
    rebuild routing. Buckets with no prior filter row cannot saturate — a
    fresh bucket is sized at ``bits_per_item`` per item on creation."""
    k = num_hashes
    counts = (new_seen
              .withColumn("bucket",
                          F.pmod(F.col("host_hash"), F.lit(n_buckets)).cast("int"))
              .groupBy("bucket").agg(F.count("*").alias("n_new")))
    state = latest_filter(filters).select(
        "bucket", "n_items", (F.length("bits") * 8).cast("double").alias("m_bits"))
    n_total = (F.col("n_items") + F.col("n_new")).cast("double")
    fpp = F.pow(F.lit(1.0) - F.exp(-F.lit(float(k)) * n_total / F.col("m_bits")),
                F.lit(float(k)))
    return sorted(r["bucket"] for r in counts.join(state, "bucket")
                  .filter(fpp > threshold).select("bucket").collect())


def rebuild_buckets(all_seen: DataFrame, buckets: list[int],
                    n_buckets: int, num_hashes: int, bits_per_item: int,
                    epoch: int, min_bits: int = 1 << 13) -> DataFrame:
    """Fresh filter rows for ``buckets``, rebuilt from the FULL seen set at
    ``bits_per_item`` per actual item — the saturation answer: the new array
    is sized to the bucket's real cardinality, restoring the design-point FPP
    (~1.2% at 10 bits / 4 hashes). ``all_seen`` needs url_hash + host_hash
    and must include the current epoch's new rows. One groupBy+applyInPandas
    pass over only the saturated buckets' rows — O(bucket), not O(table).
    FP-safety holds by construction: every seen hash sets its bits in the
    rebuilt array, so no false negatives are possible."""
    k = num_hashes
    sb = (all_seen
          .withColumn("bucket",
                      F.pmod(F.col("host_hash"), F.lit(n_buckets)).cast("int"))
          .filter(F.col("bucket").isin([int(b) for b in buckets])))

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        hashes = pdf["url_hash"].unique()
        m_bits = max(min_bits, bits_per_item * len(hashes) * 8)
        bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
        _set_bits(bits, hashes, k)
        return pd.DataFrame({"bucket": [bucket], "bits": [bits.tobytes()],
                             "n_items": [len(hashes)], "epoch": [epoch]})

    return (sb.select("bucket", "url_hash").groupBy("bucket")
            .applyInPandas(_build, schema=FILTER_SCHEMA))


def updated_buckets(new_seen: DataFrame, filters: DataFrame | None,
                    n_buckets: int, num_hashes: int, bits_per_item: int,
                    epoch: int, min_bits: int = 1 << 13,
                    all_seen: DataFrame | None = None,
                    fpp_rebuild: float | None = None) -> DataFrame:
    """New filter rows for buckets receiving items this epoch (append these;
    untouched buckets keep their previous row). ``new_seen`` needs
    ``url_hash`` + ``host_hash``.

    Saturation handling: a bucket's bit array is sized from its FIRST batch
    and thereafter only accumulates set bits, so across enough epochs its
    FPP climbs toward 1 and the negative cache silently degrades to "exact
    anti-join for everything" — the precise failure the two-phase design
    exists to avoid (SURVEY §4.2). When ``fpp_rebuild`` and ``all_seen``
    (the full seen set INCLUDING this epoch's rows) are supplied, buckets
    whose post-update :func:`fpp_estimate` would exceed the threshold are
    rebuilt from scratch at ``bits_per_item`` per actual item
    (:func:`rebuild_buckets`) instead of bit-or-updated; all other buckets
    take the normal incremental path. The rebuild touches only the
    saturated buckets' seen rows — per-epoch maintenance stays O(new items
    + saturated buckets), never O(all buckets)."""
    k = num_hashes
    nb = new_seen.withColumn("bucket",
                             F.pmod(F.col("host_hash"), F.lit(n_buckets)).cast("int"))
    flt = latest_filter(filters)

    sat: list[int] = []
    if fpp_rebuild is not None and all_seen is not None and flt is not None:
        sat = saturated_buckets(new_seen, filters, n_buckets, k, fpp_rebuild)
    if sat:
        rebuilt = rebuild_buckets(all_seen, sat, n_buckets, k,
                                  bits_per_item, epoch, min_bits)
        nb = nb.filter(~F.col("bucket").isin(sat))

    if flt is None:
        spark = new_seen.sparkSession
        flt = spark.createDataFrame([], FILTER_SCHEMA)

    def _update(new_pdf: pd.DataFrame, flt_pdf: pd.DataFrame) -> pd.DataFrame:
        if new_pdf.empty:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int32"),
                 "bits": pd.Series(dtype=object),
                 "n_items": pd.Series(dtype="int64"),
                 "epoch": pd.Series(dtype="int32")})
        bucket = int(new_pdf["bucket"].iloc[0])
        hashes = new_pdf["url_hash"].to_numpy()
        if flt_pdf.empty:
            m_bits = max(min_bits, bits_per_item * len(hashes) * 8)
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            n_old = 0
        else:
            bits = np.frombuffer(flt_pdf["bits"].iloc[0], dtype=np.uint8).copy()
            n_old = int(flt_pdf["n_items"].iloc[0])
        _set_bits(bits, hashes, k)
        return pd.DataFrame({"bucket": [bucket], "bits": [bits.tobytes()],
                             "n_items": [n_old + len(hashes)],
                             "epoch": [epoch]})

    updated = (nb.select("bucket", "url_hash").groupBy("bucket")
               .cogroup(flt.groupBy("bucket"))
               .applyInPandas(_update, schema=FILTER_SCHEMA))
    if sat:
        updated = updated.unionByName(rebuilt)
    return updated


def fpp_estimate(n_items: int, m_bits: int, k: int) -> float:
    """Standard bloom FPP estimate (per-partition lineage metric)."""
    if m_bits <= 0:
        return 1.0
    return float((1.0 - np.exp(-k * n_items / m_bits)) ** k)
