"""Custom stateful streaming operators via ``applyInPandasWithState``.

Sessionization as an arbitrary-stateful streaming op: per-user state
holds the open session (start, last-event time, count); a new event
either extends it or — when the inactivity gap is exceeded — closes it
(the closed session is emitted) and starts a new one. This is the
streaming twin of queries_ext.sessionize_events' batch gaps-and-islands
formulation, and the pattern to copy for any operator Structured
Streaming lacks natively (counters, per-key models, CDC merge).

Semantics / contract:
- Emitted rows are sessions CLOSED BY A GAP — an open session stays in
  state until a later event (in any later microbatch) closes it, so
  each user's trailing session is never emitted. Deterministic
  regardless of watermark timing, which makes it testable under an
  ``availableNow`` drain.
- Events must reach the operator per-key in event-time order across
  microbatches (within a batch the handler sorts). File-source drops
  written range-partitioned by ts satisfy this; out-of-order streams
  need a watermark + buffer-in-state variant (state schema gains an
  event buffer; same plumbing).

Scale:
- State is (3 longs)/user — millions of concurrent users fit in a few
  hundred MB of executor state store; RocksDB state store keeps it off
  heap at larger cardinalities.
- The only shuffle is the groupBy(user_id) routing every stateful op
  pays; Arrow batches carry the per-key slices into pandas.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# (open-session start, last event seen, events so far) — all epoch-us
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Streaming sessionization (gap-closed sessions only — see module
    docstring). Works on a streaming DataFrame with columns
    (user_id, ts)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def handle(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us = (
            pd.concat(list(pdfs))[ts_col]
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
        )
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int, int]] = []
        for us in ts_us:
            us = int(us)
            if start is None:
                start, last, n = us, us, 1
            elif us - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = us, us, 1
            else:
                last, n = us, n + 1
        state.update((start, last, n))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        handle,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
