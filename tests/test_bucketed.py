"""Bucketed-table co-location: a join of two tables bucketed on the same
key must run with NO shuffle exchange on either side (the cross-session
analogue of the plans/ co-partitioned caches, PERF.md §6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_computing_go_spark.sources.io import write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS t_edges_b")
    spark.sql("DROP TABLE IF EXISTS t_ranks_b")
    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 61).alias("dst")
    )
    ranks = spark.range(97).select(
        F.col("id").alias("src"), (F.col("id") * 0.01).alias("rank")
    )
    write_bucketed(edges, "t_edges_b", "src", n_buckets=8)
    write_bucketed(ranks, "t_ranks_b", "src", n_buckets=8)
    yield spark.table("t_edges_b"), spark.table("t_ranks_b")
    spark.sql("DROP TABLE IF EXISTS t_edges_b")
    spark.sql("DROP TABLE IF EXISTS t_ranks_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    e, r = bucketed_pair
    # disable auto-broadcast so the join would need a shuffle WITHOUT the
    # bucket metadata; with it, both sides read pre-clustered
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = e.join(r, "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # values still correct
        n = joined.count()
        assert n == 2000  # every src in 0..96 has a rank row
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_pair):
    e, _ = bucketed_pair
    agg = e.groupBy("src").agg(F.count("*").alias("c"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == 97


def test_bucketed_roundtrip_values(spark, bucketed_pair):
    e, _ = bucketed_pair
    expected = sorted((i % 97, i % 61) for i in range(2000))
    got = sorted(tuple(r) for r in e.collect())
    assert got == expected
