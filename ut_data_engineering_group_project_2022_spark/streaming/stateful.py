"""Custom stateful streaming operators via ``applyInPandasWithState``.

The foreachBatch pipeline (incremental.py) covers the reference's
micro-batch star load; these are the operators whose STATE is the
product — per-key session windows and a seen-set — kept in Spark's
state store across micro-batches (checkpointed, exactly-once), the
Structured Streaming shape for continuous training-data ingestion:

  * streaming_sessionize — 30-min-gap sessionization (the stateful
    twin of the batch `op_sessionize` query): open sessions ride in
    state; a session is emitted the moment a later event (any batch)
    proves it closed.
  * streaming_dedup_first_wins — keep-first exact dedup across the
    whole stream (state = one flag per text-hash group): the
    continuous form of `dedup.exact_dup_groups`, which is how a crawl
    pipeline suppresses re-seen documents at ingest time.

Scale notes: state is partitioned by the group key (user / text hash)
exactly like a shuffle, so it spreads across executors; per-group state
is O(1) (an open-session triple / one boolean), NOT a growing buffer.
Both operators tolerate within-batch disorder by sorting the batch
slice; cross-batch disorder is bounded by the upstream watermark in a
durable deployment.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int"
)
_SESSION_STATE = "open_start timestamp, open_end timestamp, open_n int"

DEDUP_OUTPUT = "text_hash string, doc_id bigint, text string"
_DEDUP_STATE = "seen boolean"


def _sessionize_fn(gap_seconds: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        events = pd.concat(list(pdfs))
        events = events.sort_values("ts")
        if state.exists:
            open_start, open_end, open_n = state.get
        else:
            open_start = open_end = None
            open_n = 0
        closed = []
        for ts in events["ts"]:
            if open_start is None:
                open_start = open_end = ts
                open_n = 1
            elif (ts - open_end).total_seconds() > gap_seconds:
                closed.append((key[0], open_start, open_end, open_n))
                open_start = open_end = ts
                open_n = 1
            else:
                open_end = ts
                open_n += 1
        state.update((open_start, open_end, open_n))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Stateful gap sessionization over a stream of (user_id, ts) events.

    Emits a row per CLOSED session; the open session per user persists in
    the state store between micro-batches. Same session semantics as the
    batch `op_sessionize` oracle (a new session starts when the gap to
    the previous event exceeds ``gap_seconds``)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        SESSION_OUTPUT,
        _SESSION_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # Hash already emitted in an earlier batch: drain and drop.
        for _ in pdfs:
            pass
        yield pd.DataFrame(columns=["text_hash", "doc_id", "text"])
        return
    rows = pd.concat(list(pdfs)).sort_values("doc_id")
    state.update((True,))
    yield rows.head(1)[["text_hash", "doc_id", "text"]]


def streaming_dedup_first_wins(docs_with_hash: DataFrame) -> DataFrame:
    """Keep-first exact dedup across the whole stream.

    Input must carry a ``text_hash`` column (group key — e.g.
    ``F.md5("text")``); the first document per hash (lowest doc_id
    within its arrival batch) is emitted, every later copy in ANY
    micro-batch is suppressed via the per-hash state flag."""
    return docs_with_hash.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        DEDUP_OUTPUT,
        _DEDUP_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_bounded_state(
    docs_with_hash: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in bounded-state exact dedup:
    ``dropDuplicatesWithinWatermark`` keeps the first row per
    ``text_hash`` and suppresses duplicates arriving within the
    watermark horizon; the hash's state is EVICTED once the watermark
    passes its first-seen event time. This is the production default at
    sustained ingest volume — :func:`streaming_dedup_first_wins`'
    NoTimeout state grows with every distinct document forever, while
    this one's state is bounded by (arrival rate x watermark). The
    trade: a duplicate arriving later than the horizon is re-emitted,
    so exactly-once dedup beyond the horizon needs the batch-side
    incremental near-dup pass (operators/dedup.incremental_neardup) as
    the backstop."""
    return docs_with_hash.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(["text_hash"])
