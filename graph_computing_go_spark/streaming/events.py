"""Watermarked streaming twin of the batch events_hourly query.

``readStream`` over a parquet directory → 1-hour tumbling window with a
1-hour watermark → append-mode sink.  ``run_stream_once`` drives it with
``trigger(availableNow=True)`` so tests (and backfills) can run the exact
streaming plan over a static directory and compare against the batch
aggregation — the standard kappa-architecture check.

At scale: the watermark bounds state (one window per (hour, event_type) per
partition in flight); the aggregation is the same two-stage hash agg Spark
uses in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_stats_stream(
    spark: SparkSession, source_dir: str, schema=None
) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # parquet may surface TIMESTAMP_NTZ; watermarks need TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_once(
    result: DataFrame, checkpoint_dir: str, table_name: str = "stream_out"
) -> DataFrame:
    """Run the streaming query to completion over currently-available data
    (availableNow trigger) into an in-memory sink; returns the sink table."""
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(table_name)


def run_stream_once_to_dir(
    result: DataFrame, checkpoint_dir: str, out_dir: str
) -> DataFrame:
    """Like run_stream_once but into a parquet sink, which (unlike the memory
    sink) supports RESUMING from the checkpoint — drive the same query over
    successive deliveries to exercise cross-run state (dedup, sessions).
    Returns a batch DataFrame over everything emitted so far."""
    q = (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.read.parquet(out_dir)
