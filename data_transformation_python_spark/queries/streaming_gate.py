"""Structured Streaming under the correctness gate: the query runs a
*real* streaming job (file source → watermarked windowed aggregation →
memory sink, availableNow trigger) and returns its final result table;
the oracle verifies it against the equivalent batch tumbling-window
SQL.  This pins the batch/streaming unification claim — the streaming
window semantics must equal DATE_TRUNC bucketing on the same data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import query

_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) as raw int64
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_STREAM_ORACLE = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("q_stream_windowed_counts", oracle=_STREAM_ORACLE)
def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts computed by an actual streaming
    query over the events file (glob-filtered file source; the nanos
    column streams as raw int64 and converts after ingest).  The
    watermark bounds aggregation state; complete output mode emits
    every window for the oracle compare."""
    # Watermarks require TIMESTAMP (instant) columns; pin the session
    # to UTC so the instant↔wall-clock conversions are identity and
    # the NTZ output matches the oracle regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Streaming aggregations get no AQE coalescing: the state-store
    # shuffle materializes every configured partition as a task (and a
    # state dir).  200 default partitions → 200 tasks for a small
    # window count; size to the parallelism actually available.
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    stream = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = f"stream_gate_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


# --------------------------------------------------------------------------
# streaming sessionization via built-in session_window, verified
# against the batch gaps-and-islands oracle
# --------------------------------------------------------------------------
_SESSION_STREAM_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flags AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS new_sess
  FROM ordered),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flags)
SELECT user_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, session_seq
"""


@query("q_stream_sessionize", oracle=_SESSION_STREAM_ORACLE)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization with the built-in ``session_window``
    (30-minute inactivity gap) run as a real streaming query; the
    oracle is the batch gaps-and-islands CTE.  Boundary semantics:
    ``session_window`` ends are exclusive (an event at exactly
    last+gap opens a NEW session), so the oracle flags new sessions
    with ``>=`` — with microsecond timestamps the distinction never
    fires in this data, but the contract is written to match exactly.
    Complete output mode emits every session (including tails that a
    timeout-based emitter would still be holding)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    stream = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.min("ts").cast("timestamp_ntz").alias("session_start"),
            F.max("ts").cast("timestamp_ntz").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "total_value"
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


# --------------------------------------------------------------------------
# streaming exact dedup — stateful dropDuplicates on the ingest path,
# verified against batch DISTINCT
# --------------------------------------------------------------------------
_STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


@query("q_stream_dedup", oracle=_STREAM_DEDUP_ORACLE)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: ``dropDuplicates`` over the
    ingest stream keeps the first arrival per (user_id, event_type)
    key in the state store and appends exactly one row per key —
    the shape a continuous training-data ingest uses to suppress
    re-delivered documents.

    Only the KEY columns are emitted: which physical row arrives
    first is micro-batch-order dependent, but the surviving key set
    equals batch DISTINCT regardless of arrival order — that is the
    deterministic contract the oracle checks.  (Production variant:
    ``dropDuplicatesWithinWatermark`` bounds state by event-time
    horizon when re-deliveries are known to arrive within a window;
    the unbounded form is used here so the gate result is exact.)"""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    stream = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
