"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the Structured Streaming surface the batch
engine's events.sessionize mirrors relationally).

Pattern: per-user BUFFERING state.  Event time gives no arrival-order
guarantee, so each user's state accumulates (ts, event_id) pairs across
micro-batches; a per-user SENTINEL row (event_id = -1, stamped after
the stream's horizon) marks end-of-user and triggers one exact
sessionize over the sorted buffer — the drained result is therefore
bit-identical to the batch operator, which is what lets the driver
check this genuinely-streaming operator against the ordinary
sessionize SQL oracle.  The sentinel's own pseudo-session is never
emitted.

State shape: two parallel arrays in the state struct (epoch seconds,
event ids).  No timeout is needed — the sentinel is the close signal —
so a killed run simply resumes from the checkpointed state store.

Scale notes: state is per-user and bounded by that user's event count
between sentinels; groups hash-partition across executors (the state
store scales with them); the emit is one vectorized pandas pass per
closing user.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
OUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "start_epoch bigint, end_epoch bigint"
)
STATE_SCHEMA = "ts array<bigint>, eid array<bigint>"

SENTINEL_EVENT_ID = -1

# One drain must be ONE micro-batch (see sessionize_stream): the trigger
# reads at most this many files per batch, so a source directory with
# more files would split the drain and break the sentinel protocol —
# sessionize_stream fails fast instead of silently mis-sessionizing.
MAX_FILES_PER_DRAIN = 1_000_000


def _sessionize_buffer(
    user_id: int, ts: list[int], eid: list[int], gap_s: int
) -> pd.DataFrame:
    """Exact batch semantics over the sorted buffer: new session when
    the gap STRICTLY exceeds gap_s; order (ts, event_id) — mirrors
    operators.events.sessionize."""
    order = sorted(range(len(ts)), key=lambda i: (ts[i], eid[i]))
    out = {"user_id": [], "session_id": [], "n_events": [], "start_epoch": [], "end_epoch": []}
    sid = 0
    start = end = None
    n = 0
    prev = None
    for i in order:
        if prev is None or ts[i] - prev > gap_s:
            if sid > 0:
                out["user_id"].append(user_id)
                out["session_id"].append(sid)
                out["n_events"].append(n)
                out["start_epoch"].append(start)
                out["end_epoch"].append(end)
            sid += 1
            start, n = ts[i], 0
        n += 1
        end = ts[i]
        prev = ts[i]
    if sid > 0:
        out["user_id"].append(user_id)
        out["session_id"].append(sid)
        out["n_events"].append(n)
        out["start_epoch"].append(start)
        out["end_epoch"].append(end)
    return pd.DataFrame(out)


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_path: str,
    checkpoint: str,
    gap_minutes: int = 30,
) -> None:
    """Drain the event stream (Trigger.AvailableNow) through the
    stateful sessionizer into parquet at `out_path`.

    `events_dir` must contain the event files AND the per-user sentinel
    file (write_sentinels) — the close signal for each user's state.

    Raises ValueError if the directory holds more than MAX_FILES_PER_DRAIN
    files: the sentinel protocol requires the whole drain in one
    micro-batch (a sentinel in an earlier batch than that user's
    remaining events would flush+remove state and orphan them), and
    maxFilesPerTrigger is the only thing enforcing it.
    """
    gap_s = gap_minutes * 60

    n_files = len(spark.read.schema(EVENT_SCHEMA).parquet(events_dir).inputFiles())
    if n_files > MAX_FILES_PER_DRAIN:
        raise ValueError(
            f"sessionize_stream: {events_dir} holds {n_files} files > "
            f"MAX_FILES_PER_DRAIN={MAX_FILES_PER_DRAIN}; the drain would "
            "split into multiple micro-batches and break the sentinel "
            "protocol. Compact the input or raise MAX_FILES_PER_DRAIN "
            "(and maxFilesPerTrigger) together."
        )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            buf_ts, buf_eid = state.get
            buf_ts, buf_eid = list(buf_ts), list(buf_eid)
        else:
            buf_ts, buf_eid = [], []
        flush = False
        for pdf in pdfs:
            for t, e in zip(pdf["ts"], pdf["event_id"]):
                if int(e) == SENTINEL_EVENT_ID:
                    flush = True
                else:
                    buf_ts.append(int(t.value // 1_000_000_000))
                    buf_eid.append(int(e))
        if flush:
            state.remove()
            yield _sessionize_buffer(int(user_id), buf_ts, buf_eid, gap_s)
        else:
            state.update((buf_ts, buf_eid))
            # zero-yield generator path: nothing to emit this batch

    # one micro-batch per drain: the sentinel protocol requires a user's
    # events to never arrive AFTER their sentinel within a drain (a
    # sentinel processed early would flush+remove state and orphan the
    # later events).  An explicit huge maxFilesPerTrigger overrides any
    # session-level default so AvailableNow reads every available file
    # in a single batch; across SEPARATE drains the protocol is safe by
    # construction (sentinels are written last, test-covered).
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", MAX_FILES_PER_DRAIN)
        .parquet(events_dir)
    )
    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .start()
    )
    q.awaitTermination()


def write_sentinels(spark: SparkSession, events: DataFrame, events_dir: str) -> None:
    """One sentinel row per user, stamped one day past the stream's
    horizon (deterministic — derived from the data, no wall clock), as
    an extra parquet file in the stream directory."""
    horizon = events.agg(F.max("ts").alias("m")).head().m
    sent = (
        events.select("user_id")
        .distinct()
        .select(
            F.lit(SENTINEL_EVENT_ID).cast("bigint").alias("event_id"),
            (F.lit(horizon) + F.expr("INTERVAL 1 DAY")).alias("ts"),
            F.col("user_id").cast("bigint").alias("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    sent.coalesce(1).write.mode("append").parquet(events_dir)
