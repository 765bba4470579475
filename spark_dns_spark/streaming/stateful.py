"""Custom stateful streaming operators (Structured Streaming).

The reference keeps all streaming state in per-zone serials (SURVEY.md
§2.9 — no watermarks, no session state); a training-data pipeline needs
real event-time state.  Two sessionization operators over a streaming
``events`` feed, both emitting CLOSED sessions:

- :func:`sessionize_stream` — ``applyInPandasWithState``: explicit
  per-user state (open session), gap-close inside the batch, event-time
  timeout to close idle sessions when the watermark passes
  ``session_end + gap``.  The template for any custom stateful operator
  Spark lacks.
- :func:`sessionize_stream_native` — ``F.session_window`` + watermark
  in append mode: the built-in operator; prefer it when plain
  windowed aggregation is enough (state lives in the state store, scale
  = number of OPEN sessions, not events).

Scale shape: state is hash-partitioned by ``user_id``; per-key state is
O(1) (one open session), so 100 TB/day of events costs one shuffle per
micro-batch plus |active users| state rows.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema of both sessionizers.
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)

#: applyInPandasWithState state: the one open session per user.
_STATE_SCHEMA = "start timestamp, end timestamp, n bigint, sv double"


def sessionize_stream(
    events: DataFrame,
    gap_min: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap-sessionize a streaming events feed with explicit state.

    Emits a session row when (a) a newer event for the same user opens
    the next session (gap exceeded inside a batch), or (b) the
    event-time watermark passes ``session_end + gap`` (user went idle —
    the timeout path).  The last open session per user stays in state
    until one of those happens; nothing is emitted twice.
    """
    import pandas as pd  # noqa: F401  (executor-side dependency)

    gap_us = gap_min * 60 * 1_000_000

    def _fn(
        key: Any, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            start, end, n, sv = state.get
            closed.append((user_id, start, end, n, sv))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            rows = [p[["ts", "value"]] for p in pdfs]
            if rows:
                batch = pd.concat(rows, ignore_index=True).sort_values("ts")
                for ts, value in zip(batch["ts"], batch["value"]):
                    if cur is None:
                        cur = [ts, ts, 1, float(value)]
                    elif (ts - cur[1]).total_seconds() * 1e6 > gap_us:
                        closed.append((user_id, *cur))
                        cur = [ts, ts, 1, float(value)]
                    else:
                        cur[1] = ts
                        cur[2] += 1
                        cur[3] += float(value)
            if cur is not None:
                state.update(tuple(cur))
                # event-time timeout: fire once the watermark passes
                # session_end + gap (epoch millis API)
                end_ms = int(cur[1].value // 1_000_000)
                state.setTimeoutTimestamp(end_ms + gap_min * 60 * 1000)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "sum_value",
                ],
            )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_stream_native(
    events: DataFrame,
    gap_min: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """The built-in equivalent: ``session_window`` + watermark, append
    mode — emits a session once the watermark passes its close."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", f"{gap_min} minutes"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("w_start"),
            F.col("session_window.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
    )
