"""Custom stateful streaming operator: per-host token-bucket admission via
``applyInPandasWithState`` (the arbitrary-stateful form named in the design —
the streaming twin of ``operators.politeness.admit``).

State per host = (tokens:int, last_trigger:int), integer math only, mirroring
the batch bucket (capacity, refill_per_epoch) semantics where one micro-batch
trigger == one epoch. Rows carry a monotonically nondecreasing global trigger
index (``trigger_col``, stamped by the ingestion layer — the discovery
epoch); a host whose last admission ran at trigger ``t0`` and that next
appears at trigger ``t`` is credited ``(t - t0) * refill`` tokens, capped at
capacity::

    avail = min(capacity, tokens + (t - t0) * refill)

so an idle host re-admits at FULL elapsed refill — exactly the batch path's
semantics, where every epoch evaluates every budget row
(operators.politeness.next_budgets refills every host every epoch). Crediting
k elapsed refills at once is arithmetically identical to k per-trigger ticks
(min-capping once equals min-capping iteratively for nonnegative refill), and
deriving k from the data keeps replays deterministic — a processing-time
timer (ProcessingTimeTimeout) would credit wall-clock-dependent refills,
making the operator's output depend on scheduler latency rather than on the
stream (and untestable against an exact oracle). The reference's gate waits
for a rate-limit reset *point* the same way: elapsed budget, not per-tick
callbacks (/root/reference/src/infrastructure/github_api.py:166-181).

Python is on this path by necessity (arbitrary state), but batched: one
pandas frame per (host, trigger) — Arrow transfer, no per-row Python
(input_hint). At 10^10 scale the stream is pre-partitioned by host hash, so
state shuffling is stable across triggers.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, IntegerType, LongType, StringType,
                               StructField, StructType)

ORDER_COLS = ["priority", "seq", "url_hash"]

OUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("url_hash", LongType()),
    StructField("priority", IntegerType()),
    StructField("seq", LongType()),
    StructField("admitted", BooleanType()),
    StructField("trigger_seq", IntegerType()),
])

STATE_SCHEMA = StructType([
    StructField("tokens", IntegerType()),
    StructField("last_trigger", IntegerType()),
])


def token_bucket_admission(discoveries: DataFrame, budgets,
                           default_capacity: int = 8,
                           trigger_col: str = "trigger_idx") -> DataFrame:
    """``discoveries``: streaming DataFrame with at least
    (host, url, url_hash, priority, seq, <trigger_col>), where
    ``trigger_col`` is a monotonically nondecreasing global trigger/epoch
    index stamped by the ingestion layer (the streaming analog of the batch
    epoch number). ``budgets``: the per-host politeness dim as a static
    DataFrame[host, capacity, refill_per_epoch], stream-static
    broadcast-joined onto the discoveries (the same broadcast-dim discipline
    as the batch path, north_rule); a plain dict ``host -> (capacity,
    refill)`` is accepted for convenience and converted. Hosts absent from
    the dim fall back to ``default_capacity``; duplicate host rows in the
    dim are collapsed (a dup would otherwise duplicate every joined
    discovery row).

    Returns every input row tagged ``admitted`` true/false per trigger, in
    deterministic (priority, seq, url_hash) order within a host;
    ``trigger_seq`` echoes the row's global trigger index."""
    spark = discoveries.sparkSession
    if trigger_col not in discoveries.columns:
        raise ValueError(
            f"discoveries must carry the global trigger index column "
            f"{trigger_col!r} (stamp it at ingestion: one value per "
            f"micro-batch/epoch)")
    if isinstance(budgets, dict):
        budgets_df = spark.createDataFrame(
            [(h, int(c), int(r)) for h, (c, r) in budgets.items()],
            "host string, capacity int, refill_per_epoch int")
    else:
        budgets_df = budgets.select("host", "capacity", "refill_per_epoch")
    # uniqueness guard: the join key must be unique on the dim side or every
    # duplicated host would admit/emit each discovery row twice
    budgets_df = budgets_df.dropDuplicates(["host"])
    default_refill = max(1, default_capacity // 2)
    enriched = (discoveries
                .withColumn("_trigger", F.col(trigger_col).cast("int"))
                .join(F.broadcast(budgets_df), "host", "left")
                .na.fill({"capacity": default_capacity,
                          "refill_per_epoch": default_refill}))

    def _bucket(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        host = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True)
        capacity = int(batch["capacity"].iloc[0])
        refill = int(batch["refill_per_epoch"].iloc[0])

        # One group batch can span several triggers (source batching);
        # process trigger values in ascending order, refilling per elapsed
        # index exactly as separate micro-batches would.
        outs = []
        for trig, grp in sorted(batch.groupby("_trigger"),
                                key=lambda kv: kv[0]):
            trig = int(trig)
            if state.exists:
                tokens, last_trigger = state.get
                elapsed = max(0, trig - int(last_trigger))
                avail = min(capacity, int(tokens) + elapsed * refill)
                # the refill clock never rolls backward: a late batch whose
                # trigger index precedes the stored one gets zero elapsed
                # credit (clamp above) AND must not regress last_trigger —
                # otherwise the next in-order batch would compute an
                # inflated elapsed and over-credit refill
                next_trigger = max(trig, int(last_trigger))
            else:
                avail = capacity   # a fresh bucket starts full
                next_trigger = trig
            grp = grp.sort_values(ORDER_COLS, kind="mergesort")
            n_admit = min(avail, len(grp))
            state.update((int(avail - n_admit), next_trigger))
            outs.append(pd.DataFrame({
                "host": host,
                "url": grp["url"].to_numpy(),
                "url_hash": grp["url_hash"].to_numpy(),
                "priority": grp["priority"].to_numpy(),
                "seq": grp["seq"].to_numpy(),
                "admitted": [True] * n_admit + [False] * (len(grp) - n_admit),
                "trigger_seq": trig,
            }))
        yield pd.concat(outs, ignore_index=True)

    return (enriched
            .groupBy("host")
            .applyInPandasWithState(
                _bucket, OUT_SCHEMA, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def simulate_token_bucket(batches: list[pd.DataFrame], budgets: dict,
                          default_capacity: int = 8) -> pd.DataFrame:
    """Pure-pandas oracle for :func:`token_bucket_admission`: same integer
    bucket semantics, one entry per (trigger, row). Batch ``i`` carries
    global trigger index ``i``; a host absent for k triggers is credited
    ``k * refill`` (capped at capacity) on its next appearance, matching the
    elapsed-trigger refill rule the operator ships."""
    state: dict[str, tuple[int, int]] = {}   # host -> (tokens, last_trigger)
    rows = []
    for trigger, pdf in enumerate(batches):
        for host, grp in pdf.groupby("host"):
            capacity, refill = budgets.get(
                host, (default_capacity, max(1, default_capacity // 2)))
            if host in state:
                tokens, last_trigger = state[host]
                avail = min(capacity,
                            tokens + (trigger - last_trigger) * refill)
            else:
                avail = capacity
            grp = grp.sort_values(ORDER_COLS, kind="mergesort")
            n_admit = min(avail, len(grp))
            for i, r in enumerate(grp.itertuples()):
                rows.append((host, r.url, r.url_hash, r.priority, r.seq,
                             i < n_admit, trigger))
            state[host] = (avail - n_admit, trigger)
    return pd.DataFrame(rows, columns=[f.name for f in OUT_SCHEMA.fields])
