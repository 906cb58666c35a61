"""S10 MERGE/upsert sink: key-scoped replace, idempotent re-runs
(wikipediaInDegree.go:62-78 synthetic-key upsert semantics)."""

from __future__ import annotations

from graph_computing_go_spark.sources.io import merge_result, read_result


def _rows(spark, warehouse, table):
    return sorted(
        tuple(r) for r in read_result(spark, warehouse, table).collect()
    )


def test_merge_upsert_and_idempotence(spark, tmp_path):
    wh = str(tmp_path)
    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, k string, v int"
    )
    merge_result(df1, wh, "t", keys=("id",))
    assert _rows(spark, wh, "t") == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]

    # overlapping keys replace, fresh keys insert, untouched keys survive
    df2 = spark.createDataFrame(
        [(2, "b", 99), (4, "d", 40)], "id int, k string, v int"
    )
    merge_result(df2, wh, "t", keys=("id",))
    assert _rows(spark, wh, "t") == [
        (1, "a", 10),
        (2, "b", 99),
        (3, "c", 30),
        (4, "d", 40),
    ]

    # re-running the same batch is a no-op (the S10 idempotence contract)
    merge_result(df2, wh, "t", keys=("id",))
    assert _rows(spark, wh, "t") == [
        (1, "a", 10),
        (2, "b", 99),
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_merge_composite_key(spark, tmp_path):
    wh = str(tmp_path)
    df1 = spark.createDataFrame(
        [(2000, 10, 1.0), (2000, 20, 2.0), (2001, 10, 3.0)],
        "year int, percent int, h double",
    )
    merge_result(df1, wh, "stats", keys=("year", "percent"))
    df2 = spark.createDataFrame(
        [(2000, 20, 5.0)], "year int, percent int, h double"
    )
    merge_result(df2, wh, "stats", keys=("year", "percent"))
    assert _rows(spark, wh, "stats") == [
        (2000, 10, 1.0),
        (2000, 20, 5.0),
        (2001, 10, 3.0),
    ]


def test_merge_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between retiring the live dir and promoting staging leaves
    only '<table>.old'; the next merge must restore it, not drop rows."""
    import os

    wh = str(tmp_path)
    df1 = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    merge_result(df1, wh, "t", keys=("id",))
    path = os.path.join(wh, "t")
    os.replace(path, path + ".old")  # simulate the crash window

    df2 = spark.createDataFrame([(2, 99)], "id int, v int")
    merge_result(df2, wh, "t", keys=("id",))
    assert _rows(spark, wh, "t") == [(1, 10), (2, 99)]
    assert not os.path.exists(path + ".old")
