"""Custom stateful streaming operator: per-host token-bucket admission via
``applyInPandasWithState`` (the arbitrary-stateful form named in the design —
the streaming twin of ``operators.politeness.admit``).

State per host = (tokens:int, n_triggers:int), integer math only, mirroring
the batch bucket (capacity, refill_per_epoch) semantics where one micro-batch
trigger == one epoch: on each trigger a host's availability is
``min(capacity, tokens + refill)``; admitted rows debit it; unadmitted rows
are emitted with ``admitted = false`` so the caller can re-enqueue (the
streaming analog of the frontier's natural requeue, SURVEY.md §2.8 T6).

**Lazy-refill deviation (deliberate):** with ``NoTimeout`` the state function
only runs for hosts that have rows in a trigger, so a host idle for k
triggers is credited ONE refill on its next appearance, not k. This
under-admits after idle periods — conservative (politeness is never
violated) — and the pure-pandas oracle implements the identical rule, so
the parity test covers the semantics actually shipped. Crediting k refills
would need a timeout tick per idle host (ProcessingTimeTimeout), which buys
throughput for bursty hosts at the cost of a timer per host; the batch path
(operators.politeness) has no such gap because every epoch evaluates every
budget row.

Python is on this path by necessity (arbitrary state), but batched: one
pandas frame per (host, trigger) — Arrow transfer, no per-row Python
(input_hint). At 10^10 scale the stream is pre-partitioned by host hash, so
state shuffling is stable across triggers.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType, BooleanType,
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
    StructField("n_triggers", IntegerType()),
])


def token_bucket_admission(discoveries: DataFrame, budgets,
                           default_capacity: int = 8) -> DataFrame:
    """``discoveries``: streaming DataFrame with at least
    (host, url, url_hash, priority, seq). ``budgets``: the per-host
    politeness dim as a static DataFrame[host, capacity, refill_per_epoch],
    stream-static broadcast-joined onto the discoveries (the same
    broadcast-dim discipline as the batch path, north_rule); a plain dict
    ``host -> (capacity, refill)`` is accepted for convenience and converted.
    Hosts absent from the dim fall back to ``default_capacity``.

    Returns every input row tagged ``admitted`` true/false per trigger, in
    deterministic (priority, seq, url_hash) order within a host."""
    spark = discoveries.sparkSession
    if isinstance(budgets, dict):
        budgets_df = spark.createDataFrame(
            [(h, int(c), int(r)) for h, (c, r) in budgets.items()],
            "host string, capacity int, refill_per_epoch int")
    else:
        budgets_df = budgets.select("host", "capacity", "refill_per_epoch")
    default_refill = max(1, default_capacity // 2)
    enriched = (discoveries
                .join(F.broadcast(budgets_df), "host", "left")
                .na.fill({"capacity": default_capacity,
                          "refill_per_epoch": default_refill}))

    def _bucket(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        host = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True)
        capacity = int(batch["capacity"].iloc[0])
        refill = int(batch["refill_per_epoch"].iloc[0])
        if state.exists:
            tokens, n_triggers = state.get
        else:
            tokens, n_triggers = capacity, 0
        avail = min(capacity, tokens + (refill if n_triggers > 0 else 0))

        batch = batch.sort_values(ORDER_COLS, kind="mergesort")
        n_admit = min(avail, len(batch))
        admitted_flags = [True] * n_admit + [False] * (len(batch) - n_admit)

        state.update((int(avail - n_admit), int(n_triggers + 1)))
        out = pd.DataFrame({
            "host": host,
            "url": batch["url"].to_numpy(),
            "url_hash": batch["url_hash"].to_numpy(),
            "priority": batch["priority"].to_numpy(),
            "seq": batch["seq"].to_numpy(),
            "admitted": admitted_flags,
            "trigger_seq": int(n_triggers),
        })
        yield out

    return (enriched
            .groupBy("host")
            .applyInPandasWithState(
                _bucket, OUT_SCHEMA, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def simulate_token_bucket(batches: list[pd.DataFrame], budgets: dict,
                          default_capacity: int = 8) -> pd.DataFrame:
    """Pure-pandas oracle for :func:`token_bucket_admission`: same integer
    bucket semantics, one entry per (trigger, row) — INCLUDING the lazy-refill
    rule (a host absent from a batch is not ticked; see module docstring), so
    the parity test checks the shipped semantics, not an idealized clock."""
    state: dict[str, tuple[int, int]] = {}
    rows = []
    for trigger, pdf in enumerate(batches):
        for host, grp in pdf.groupby("host"):
            capacity, refill = budgets.get(
                host, (default_capacity, max(1, default_capacity // 2)))
            tokens, n_triggers = state.get(host, (capacity, 0))
            avail = min(capacity, tokens + (refill if n_triggers > 0 else 0))
            grp = grp.sort_values(ORDER_COLS, kind="mergesort")
            n_admit = min(avail, len(grp))
            for i, r in enumerate(grp.itertuples()):
                rows.append((host, r.url, r.url_hash, r.priority, r.seq,
                             i < n_admit, n_triggers))
            state[host] = (avail - n_admit, n_triggers + 1)
    return pd.DataFrame(rows, columns=[f.name for f in OUT_SCHEMA.fields])
