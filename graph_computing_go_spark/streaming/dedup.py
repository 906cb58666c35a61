"""Streaming exact dedup — the incremental twin of ``operators.dedup.exact_dedup``.

A training-data feed is append-only: documents arrive continuously and the
pipeline must keep the FIRST occurrence of each distinct content and drop
every later duplicate without re-scanning history.  Spark's native stateful
operator for exactly this is ``dropDuplicatesWithinWatermark``: state holds
one row per content key and the event-time watermark EVICTS keys once no
duplicate can still arrive, so state is bounded by (dedup horizon × arrival
rate), not by corpus size — the property that makes this run forever at
100 TB/day.

Contract vs the batch operator (pinned by test):

- Same content key: ``sha2(text, 256)`` — a kept-set from either path groups
  identically.
- Batch keeps the MIN id per group (a global decision); streaming keeps the
  FIRST-SEEN row (an arrival-order decision — the only one available without
  unbounded state).  The kept HASH SET is identical; the representative id
  may differ.  Downstream joins must key on the hash, not the kept id, when
  mixing the two paths.
- A duplicate arriving more than ``watermark`` after its first occurrence is
  past the eviction horizon and is re-emitted (one extra representative for
  that content).  Size the watermark to the feed's real re-post horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exact_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    schema=None,
) -> DataFrame:
    """readStream over a parquet directory → one first-seen row per distinct
    content within the watermark horizon: (hash, id, ts)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.select(
            F.sha2(F.col(text_col), 256).alias("hash"),
            F.col(id_col).alias("id"),
            F.col(ts_col).cast("timestamp").alias("ts"),
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["hash"])
    )
