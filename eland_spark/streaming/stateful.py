"""Custom stateful streaming operator via applyInPandasWithState.

The stock ``session_window`` (windows.py) covers gap-based sessions;
this operator is the template for semantics Spark's built-ins can't
express: arbitrary per-key state evolved across micro-batches with
explicit timeouts. State is one small tuple per open session per key —
at 100 TB/day the state size is O(active keys), bounded by the event-
time timeout, and lives in the state store (RocksDB in production),
never the JVM heap.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize_with_state", "SESSION_STATS_SCHEMA",
           "anomaly_scores_with_state", "ANOMALY_SCHEMA",
           "funnel_with_state", "FUNNEL_SCHEMA"]

# emitted once per CLOSED session
SESSION_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_types", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("types", T.StringType()),  # '\x1f'-joined distinct types
    ]
)


def _make_fn(gap_ms: int, ts_col: str, value_col: str, type_col: str):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n, total, types = state.get
                closed.append((user_id, start_ms, last_ms, n, total, types))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(ts_col)
            if state.exists:
                start_ms, last_ms, n, total, types = state.get
            else:
                start_ms = last_ms = None
                n, total, types = 0, 0.0, ""
            tset = set(t for t in types.split("\x1f") if t)
            for _, r in rows.iterrows():
                ms = int(r[ts_col].value // 1_000_000)
                if last_ms is not None and ms - last_ms > gap_ms:
                    closed.append(
                        (user_id, start_ms, last_ms, n, total, "\x1f".join(sorted(tset)))
                    )
                    start_ms, n, total, tset = ms, 0, 0.0, set()
                if start_ms is None:
                    start_ms = ms
                last_ms = ms
                n += 1
                v = r[value_col]
                total += 0.0 if pd.isna(v) else float(v)
                tset.add(str(r[type_col]))
            state.update((start_ms, last_ms, n, total, "\x1f".join(sorted(tset))))
            # close the open session `gap` past the newest event, by the
            # event-time watermark clock (not wall time). A legitimately
            # late event can leave last_ms + gap BEHIND the current
            # watermark; Spark rejects timeout timestamps <= watermark,
            # so clamp to watermark + 1ms (fires next micro-batch).
            timeout = last_ms + gap_ms
            wm = state.getCurrentWatermarkMs()
            if timeout <= wm:
                timeout = wm + 1
            state.setTimeoutTimestamp(timeout)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [c[4] for c in closed],
                    "n_types": [len([t for t in c[5].split("\x1f") if t]) for c in closed],
                }
            )

    return fn


def sessionize_with_state(
    sdf: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization with per-session distinct-type counts —
    state the stock session_window cannot carry. Emits one row per
    closed session (append mode); open sessions close via event-time
    timeout once the watermark passes last_event + gap."""
    from .windows import _with_watermark

    unit = {"second": 1_000, "seconds": 1_000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000,
            "day": 86_400_000, "days": 86_400_000}
    qty, u = gap.split()
    gap_ms = int(qty) * unit[u]

    sdf = _with_watermark(sdf, ts_col, watermark)
    return sdf.groupBy(key_col).applyInPandasWithState(
        _make_fn(gap_ms, ts_col, value_col, type_col),
        outputStructType=SESSION_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# streaming rolling z-score (twin of operators/timeseries.rolling_zscore)
# ---------------------------------------------------------------------------

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

# trailing window of raw values (NaN marks a null row: it occupies a
# window slot but contributes nothing — the batch twin's frame is
# row-based while its aggregates skip nulls)
_ANOMALY_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.DoubleType()))]
)


def _make_anomaly_fn(window: int, min_periods: int, threshold: float,
                     ts_col: str, id_col: str, value_col: str):
    import math

    def fn(key, pdfs, state):
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col])
        vals = list(state.get[0]) if state.exists else []
        out_id, out_v, out_z, out_flag = [], [], [], []
        for _, r in rows.iterrows():
            prev = [v for v in vals if not math.isnan(v)]
            x = r[value_col]
            z = None
            if (
                not pd.isna(x)
                and len(prev) >= min_periods
            ):
                n = len(prev)
                mean = sum(prev) / n
                var = sum((v - mean) ** 2 for v in prev) / (n - 1)
                sd = math.sqrt(var)
                if sd > 0:
                    z = round((float(x) - mean) / sd, 6)
            out_id.append(int(r[id_col]))
            out_v.append(None if pd.isna(x) else float(x))
            out_z.append(z)
            out_flag.append(bool(z is not None and abs(z) >= threshold))
            vals.append(float("nan") if pd.isna(x) else float(x))
            if len(vals) > window:
                vals = vals[-window:]
        state.update((vals,))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_id),
                "event_id": out_id,
                "value": out_v,
                "zscore": out_z,
                "is_anomaly": out_flag,
            }
        )

    return fn


def anomaly_scores_with_state(
    sdf: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.rolling_zscore``: each
    event is scored against the trailing ``window`` values of its key
    (self excluded, NaN rows occupy slots but contribute nothing —
    identical frame semantics to the batch operator), then appended to
    the state. State is O(window) doubles per key in the state store,
    no timeout (a key's baseline survives quiet periods).

    Equivalence to the batch twin holds when each key's events arrive
    in event-time order across micro-batches (the per-key-partitioned
    ingest layout); within a micro-batch, rows are sorted by
    (ts, id) exactly like the batch ordering. Pinned against the batch
    operator in tests/test_streaming.py."""
    return sdf.groupBy(key_col).applyInPandasWithState(
        _make_anomaly_fn(int(window), int(min_periods), float(threshold),
                         ts_col, id_col, value_col),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming ordered funnel (twin of operators/funnel.funnel_chains)
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step_index", T.IntegerType()),
        T.StructField("step", T.StringType()),
        T.StructField("step_ts", T.TimestampType()),
    ]
)

# matched-prefix of epoch-micro step timestamps (variable length <= k;
# a fixed-size nullable array does not round-trip the state store)
_FUNNEL_STATE_SCHEMA = T.StructType(
    [T.StructField("hits", T.ArrayType(T.LongType()))]
)


def _make_funnel_fn(steps, ts_col: str, type_col: str,
                    within_us: "int | None"):
    k = len(steps)
    rank = {}
    for i, s in enumerate(steps):
        rank.setdefault(s, i + 1)  # first occurrence, like array_position

    def fn(key, pdfs, state):
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows[type_col].isin(rank) & rows[ts_col].notna()]
        hits = list(state.get[0]) if state.exists else []
        out = []
        if len(hits) < k and len(rows):
            rows = rows.assign(__r__=rows[type_col].map(rank))
            rows = rows.sort_values([ts_col, "__r__"])
            for _, r in rows.iterrows():
                if len(hits) >= k:
                    break
                if r[type_col] != steps[len(hits)]:
                    continue
                tus = int(r[ts_col].value // 1_000)
                hits.append(tus)
                # the batch twin matches greedily FIRST and applies the
                # window post-hoc: an out-of-window event still consumes
                # its step, it just is not reported as a completion
                if within_us is None or tus - hits[0] <= within_us:
                    out.append((len(hits), steps[len(hits) - 1], tus))
            state.update((hits,))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "step_index": [o[0] for o in out],
                "step": [o[1] for o in out],
                "step_ts": [pd.Timestamp(o[2], unit="us") for o in out],
            }
        )

    return fn


def funnel_with_state(
    sdf: DataFrame,
    steps: "list[str]",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: "int | None" = None,
) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel_chains``: emits one
    append-mode row the moment a user completes their next funnel step.
    State is the matched prefix — at most k longs per user, no timeout
    (a funnel stays open indefinitely; compose a watermark upstream to
    bound it).

    Same greedy-chain semantics as the batch fold: within a micro-batch
    rows process in (ts, step-rank) order; equivalence to the batch
    twin holds when each key's events arrive in event-time order across
    micro-batches (the per-key-partitioned ingest layout). The
    ``within_seconds`` window gates completions against the step-1
    time, exactly like the batch operator."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = None if within_seconds is None else int(within_seconds) * 1_000_000
    return sdf.groupBy(key_col).applyInPandasWithState(
        _make_funnel_fn(list(steps), ts_col, type_col, w),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
