"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (Arrow-batched per-user state), the streaming
twin of the batch ``sessionize`` query (lag + cumulative sum).

Contract: after processing an event log to head (one or several
``availableNow`` runs sharing a checkpoint — the streaming analog of the
cursor loop), the latest emission per (user_id, session_id) equals the
batch sessionization of the full log. Sessions spanning run boundaries
continue from checkpointed state (n_sessions, last_ts, open-session
count), so incremental runs never split or double-count a session.

State is per user and O(1) — three scalars — regardless of history
length; each micro-batch's per-user work is vectorized pandas (diff +
cumsum), not a per-row python loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

OUT_SCHEMA = "user_id long, session_id long, n_events long"
STATE_SCHEMA = "n_sessions long, last_ts double, open_n long"


def _make_session_fn(gap_sec: int):
    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n_sessions, last_ts, open_n = state.get if state.exists else (0, None, 0)
        batches = [pdf for pdf in pdf_iter if len(pdf)]
        if not batches:
            return
        rows = pd.concat(batches).sort_values(["ts", "event_id"])
        ts = rows["ts"].astype("int64").to_numpy() / 1e9
        # vectorized gap detection: first row compares against the
        # checkpointed last_ts, the rest against their predecessor
        prev = pd.Series(ts).shift(1)
        if last_ts is not None:
            prev.iloc[0] = last_ts
        new_sess = (prev.isna() | ((pd.Series(ts) - prev) > gap_sec)).to_numpy()
        sess_idx = n_sessions + new_sess.cumsum()  # 1-based continuing ids
        counts = pd.Series(1, index=sess_idx).groupby(level=0).sum()
        if not new_sess[0]:
            counts.iloc[0] += open_n  # continue the open session
        state.update((int(sess_idx[-1]), float(ts[-1]), int(counts.iloc[-1])))
        yield pd.DataFrame({
            "user_id": user_id,
            "session_id": counts.index.astype("int64"),
            "n_events": counts.to_numpy().astype("int64"),
        })

    return fn


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    *,
    gap_sec: int = 1800,
):
    """Run the stateful sessionizer to the log's head (availableNow) and
    append each micro-batch's updated sessions (tagged with the batch id)
    to ``out_dir``. Re-running with the same checkpoint processes only
    new files and continues sessions from state."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    sess = events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_sec),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    return (
        sess.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest emission per (user_id, session_id) — the operator's current
    answer after any number of incremental runs."""
    raw = spark.read.parquet(out_dir)
    return (
        raw.groupBy("user_id", "session_id")
        .agg(F.max(F.struct("batch_id", "n_events")).alias("m"))
        .select("user_id", "session_id", F.col("m.n_events").alias("n_events"))
    )
