"""Generic sources & sinks mirroring the reference's scan/sink inventory.

- S7 weighted-edge TSV scan (/root/reference/internal/openAlexEntropy/
  openAlexLv2DistanceComplexity.go:30-109): schema'd csv read, malformed and
  |distance|<=1e-9 rows dropped (:82-85).
- S9/S11 result sinks (mongoClient.go:163-295 insert batches): partitioned
  parquet append — batching/ordering is Spark's job; a result table per
  statistic keyed by the same (year, percent, rank_type) grain.
- S12 task ledger (mongoClient.go:65-79 Is_task_exist/Insert_task): a tiny
  idempotence table so re-running an ingest skips completed units — the
  driver-visible cousin of the superstep checkpoint manifests
  (plans/superstep.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEIGHTED_TSV_SCHEMA = T.StructType(
    [
        T.StructField("year", T.IntegerType(), True),
        T.StructField("concept1", T.StringType(), True),
        T.StructField("concept2", T.StringType(), True),
        T.StructField("distance", T.DoubleType(), True),
    ]
)


def read_weighted_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S7: tab-separated (year, c1, c2, distance); malformed rows null out
    under PERMISSIVE mode and are dropped, zero-distance rows skipped
    (openAlexLv2DistanceComplexity.go:82-85)."""
    df = spark.read.csv(path, sep="\t", schema=WEIGHTED_TSV_SCHEMA, mode="PERMISSIVE")
    return df.filter(
        F.col("year").isNotNull()
        & F.col("concept1").isNotNull()
        & F.col("concept2").isNotNull()
        & (F.abs(F.coalesce(F.col("distance"), F.lit(0.0))) > 1e-9)
    )


def write_result(
    df: DataFrame, warehouse: str, table: str, partition_by: tuple[str, ...] = ()
) -> str:
    """S9/S11: append a result DataFrame to a parquet table (Iceberg swap-in
    point: same call shape with .writeTo(table).append())."""
    path = os.path.join(warehouse, table)
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def read_result(spark: SparkSession, warehouse: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(warehouse, table))


def merge_result(
    df: DataFrame, warehouse: str, table: str, keys: tuple[str, ...]
) -> str:
    """S10 idempotent MERGE/upsert sink (wikipediaInDegree.go:62-78: the
    synthetic-key upsert that makes re-running a result job a no-op instead
    of duplicating rows).

    Semantics: rows in ``df`` REPLACE existing rows with the same ``keys``
    tuple; other existing rows survive.  On parquet this is read → anti-join
    → union → atomic directory swap (write to .staging, rename over).  On a
    real deployment the same call maps to Iceberg ``MERGE INTO t USING s ON
    <keys> WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`` — one
    shuffle on the key either way, no full-table rewrite there because
    Iceberg scopes the rewrite to matched files.

    SINGLE-WRITER assumption (parquet stand-in only): the read-modify-write
    is not locked, so two concurrent merges into the same table can lose one
    writer's upserts, and a reader racing the two-rename window can observe
    the table directory momentarily absent.  Iceberg's optimistic snapshot
    commit removes both limitations on a real deployment.
    """
    import shutil

    spark = df.sparkSession
    path = os.path.join(warehouse, table)
    staging = path + ".staging"
    retired = path + ".old"
    # crash recovery: a previous merge that died between retiring the live
    # dir and promoting its staging dir leaves only '.old' — restore it so
    # prior rows are never silently dropped
    if not os.path.exists(path) and os.path.exists(retired):
        os.replace(retired, path)
    shutil.rmtree(retired, ignore_errors=True)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        survivors = existing.join(
            df.select(*keys).dropDuplicates(list(keys)), list(keys), "left_anti"
        )
        merged = survivors.unionByName(df)
    else:
        merged = df
    merged.write.mode("overwrite").parquet(staging)
    # two renames instead of rmtree-then-rename: every crash window leaves
    # either the old table at `path`/'.old' or the new one at `path`
    if os.path.exists(path):
        os.replace(path, retired)
    os.replace(staging, path)
    shutil.rmtree(retired, ignore_errors=True)
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (hash-clustered + sorted) on ``bucket_col``
    — the storage-level co-location tool for repeated large⋈large joins:
    two tables bucketed on the same key with the same bucket count join
    with NO exchange on either side (verified in tests/test_bucketed.py by
    plan inspection).  The in-session analogue is the `repartition(n, key)`
    edge caches in plans/ (PERF.md §6); bucketing is the cross-session,
    cross-job version — at 100 TB the edge table is written once, bucketed
    by src, and every downstream join/groupBy on src skips its shuffle.

    Uses saveAsTable (bucket metadata lives in the catalog; plain
    .parquet(path) cannot record it).  Iceberg swap-in: the same call shape
    with a partitioned/sorted table spec."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


class TaskLedger:
    """S12 idempotent-work ledger: skip a unit if its id is recorded; record
    after success.  File-backed JSON (atomic rename per write) — swap for an
    Iceberg table on a real deployment."""

    def __init__(self, path: str):
        self.path = path
        self._done: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                self._done = set(json.load(f))

    def is_done(self, task_id: str) -> bool:
        return task_id in self._done

    def mark_done(self, task_id: str) -> None:
        self._done.add(task_id)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(self._done), f)
        os.replace(tmp, self.path)

    def run_once(self, task_id: str, fn):
        """Execute fn() unless the ledger already has task_id
        (extractWikipediaDump.go:50-53,99 pattern)."""
        if self.is_done(task_id):
            return None
        out = fn()
        self.mark_done(task_id)
        return out
