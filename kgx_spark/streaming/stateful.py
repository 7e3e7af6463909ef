"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no event-time streaming (SURVEY.md §2.8: KGX "stream" =
bounded pull iteration), but the training-data pipeline brief requires
custom stateful operators on the event stream. Two are provided, both
Arrow-batched (no per-row Python):

- ``stateful_sessionize``: cross-batch session tracking keyed by user — a
  session's state (start, last-seen, count) persists in the state store
  between micro-batches; a session is EMITTED when a later event arrives
  more than ``gap`` after its last event (closed-by-gap). This is the
  streaming twin of operators/events.sessionize (the batch lag+cumsum
  version) for unbounded input where a window over all history is
  impossible.
- ``stateful_user_counts``: running per-key totals — the minimal
  state-store demonstration (per-batch count + cumulative count).

State is bounded: one fixed-width row per active key; sessionize reclaims
idle-user state via ProcessingTimeTimeout by default (a timed-out key
flushes its open session and removes its state row), with NoTimeout
available for bounded replay inputs.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SESSION_OUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_SESSION_STATE = "start double, last double, n bigint"

_COUNT_OUT = "user_id bigint, batch_events bigint, total_events bigint"
_COUNT_STATE = "total bigint"


def _sessionize_fn(gap_seconds: float, use_timeout: bool):
    import pandas as pd

    def _frame(rows: list[tuple]) -> "pd.DataFrame":
        out = pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        return out

    def fn(key: Any, pdfs: Iterable["pd.DataFrame"], state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            # idle key: flush the open session and reclaim the state slot —
            # this is what keeps the state store bounded on an unbounded key
            # space (round-2 ADVICE: NoTimeout never reclaims idle keys)
            if state.exists:
                start, last, n = state.get
                state.remove()
                if start is not None:
                    yield _frame([(user_id, start, last, n)])
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple] = []
        ts_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts"].astype("int64").to_numpy() / 1e9)
        for t in sorted(ts_all):
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                # a late cross-batch event (t < last) must NOT move the
                # session's last-seen backwards — that would prematurely
                # close the session on the next in-order event
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        if use_timeout:
            # re-arm per invocation (required by ProcessingTimeTimeout): if
            # no event arrives for ~gap, the open session is flushed above
            state.setTimeoutDuration(int(gap_seconds * 1000))
        if closed:
            yield _frame(closed)

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    timeout_conf: str = GroupStateTimeout.ProcessingTimeTimeout,
) -> DataFrame:
    """Streaming events(user_id, ts, …) → closed sessions
    (user_id, session_start, session_end, n_events).

    ``timeout_conf`` defaults to ProcessingTimeTimeout so idle-key state is
    reclaimable (an unbounded key space with NoTimeout grows the state store
    forever); pass GroupStateTimeout.NoTimeout for bounded replay inputs
    (e.g. availableNow test runs) where reclamation doesn't matter."""
    grouped = events.select(key_col, ts_col).groupBy(key_col)
    use_timeout = timeout_conf != GroupStateTimeout.NoTimeout
    return grouped.applyInPandasWithState(
        _sessionize_fn(gap_minutes * 60.0, use_timeout),
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def _counts_fn():
    import pandas as pd

    def fn(key: Any, pdfs: Iterable["pd.DataFrame"], state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame(
            [(user_id, batch, total)], columns=["user_id", "batch_events", "total_events"]
        )

    return fn


def stateful_user_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming events → one row per (key, micro-batch): batch + running count."""
    return events.select(key_col).groupBy(key_col).applyInPandasWithState(
        _counts_fn(),
        outputStructType=_COUNT_OUT,
        stateStructType=_COUNT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
