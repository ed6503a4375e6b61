"""Custom stateful streaming operator (SURVEY.md §2.11, OP-LLM-05/06
— [mandate]).

``applyInPandasWithState`` is the escape hatch for operators the
built-in windowed aggregates can't express. The canonical
training-data-pipeline case implemented here: ONLINE EXACT DEDUP —
emit each document the first time its content hash is seen, drop
every later occurrence, across micro-batches, with per-key state in
the state store.

Scale posture: state is one boolean per distinct hash, partitioned by
the grouping key — the state store shards with the shuffle, so a
1000-executor cluster holds 1000 state shards. A TTL (timeout) bounds
state for unbounded streams where "duplicate within N hours" is the
real contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("text_hash", StringType()),
        StructField("doc_id", LongType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_first_seen_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """First-seen filter over a document stream: group by content
    hash, keep per-hash ``seen`` state, emit only rows of the first
    batch in which a hash appears (min id within that batch, matching
    the batch keep-first contract).

    Returns an unstarted streaming DataFrame (append mode); callers
    pick sink + trigger. Batch equivalence: the set of emitted
    (text_hash, doc_id) pairs equals ``llm.dedup.exact_dedup_groups``
    keep-ids when the whole input arrives in one batch, and is a
    prefix-consistent superset-free subset under any batching.
    """
    hashed = docs_stream.select(
        F.sha2(F.col(text_col), 256).alias("text_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )

    # Self-contained closure: cloudpickle ships it by value; workers
    # need no access to this package (foreign-CWD driver sessions).
    def dedup(key, pdfs, state):
        import pandas as pd

        if state.exists:
            for _ in pdfs:
                pass
            yield pd.DataFrame({"text_hash": [], "doc_id": []})
        else:
            best = None
            for pdf in pdfs:
                if len(pdf):
                    m = int(pdf["doc_id"].min())
                    best = m if best is None else min(best, m)
            state.update((1,))
            if best is None:
                yield pd.DataFrame({"text_hash": [], "doc_id": []})
            else:
                yield pd.DataFrame({"text_hash": [key[0]], "doc_id": [best]})

    return hashed.groupBy("text_hash").applyInPandasWithState(
        dedup,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_watermark_dedup(
    events_stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Built-in bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and
    EVICTS the key's state once the watermark passes its event time
    — the right contract for unbounded streams where "duplicate"
    means "again within the lateness horizon", and the zero-custom-
    code counterpart to :func:`streaming_first_seen_dedup` (which
    keeps state forever unless a TTL is set).

    State is O(distinct keys per watermark window), sharded with the
    shuffle. Returns an unstarted streaming DataFrame (append mode).
    """
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
