"""Tests for label/taxonomy operators and generic sources/sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_computing_go_spark.operators.labels import (
    dense_string_ids,
    parse_core_tags,
    route_edges_by_labels,
    wiki_degree_histograms,
)
from graph_computing_go_spark.sources.io import (
    TaskLedger,
    read_result,
    read_weighted_tsv,
    write_result,
)


def test_parse_core_tags(spark):
    df = spark.createDataFrame(
        [
            (1, ["lv1-Math-1998", "lv2-Algebra-1998", "lv1-Physics-2001", "junk"]),
            (2, ["lv2-Only-1999"]),
        ],
        "id long, tags array<string>",
    )
    got = {r["id"]: sorted(r["subjects"]) for r in parse_core_tags(df).collect()}
    assert got == {1: ["Math", "Physics"], 2: []}
    wl = {
        r["id"]: sorted(r["subjects"])
        for r in parse_core_tags(df, whitelist=["Math"]).collect()
    }
    assert wl[1] == ["Math"]


def test_route_edges_by_labels(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["y", "z"]), (3, ["q"])],
        "id long, labels array<string>",
    )
    got = sorted(
        (r["src"], r["dst"], r["discipline"])
        for r in route_edges_by_labels(edges, labels).collect()
    )
    assert got == [(1, 2, "y")]  # (2,3) and (1,3) share nothing


def test_dense_string_ids_deterministic(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",)], "name string"
    )
    got = {r["key"]: r["dense_id"] for r in dense_string_ids(df, "name").collect()}
    assert got == {"a": 1, "b": 2, "c": 3}


def test_wiki_degree_histograms_quirk(spark):
    pages = spark.createDataFrame(
        [
            (1, ["t2", "t3", "missing"], [2, 3]),
            (2, ["t1"], [1]),
            (3, [], []),
        ],
        "id long, links_out array<string>, links_out_ids array<long>",
    )
    got = {
        (r["kind"], r["degree"]): r["n_nodes"]
        for r in wiki_degree_histograms(pages).collect()
    }
    # 'links_in' histograms RESOLVED out-degree; 'links_out' the raw count
    assert got[("links_in", 2)] == 1 and got[("links_in", 1)] == 1
    assert got[("links_out", 3)] == 1 and got[("links_out", 1)] == 1
    assert got[("links_in", 0)] == 1 and got[("links_out", 0)] == 1


def test_weighted_tsv_scan(spark, tmp_path):
    p = tmp_path / "w.tsv"
    p.write_text(
        "2001\ta\tb\t0.5\n"
        "2001\tc\td\t0.0\n"  # zero distance -> dropped
        "garbage line without tabs\n"  # malformed -> dropped
        "2002\te\tf\t-1.25\n"
    )
    rows = sorted(
        map(tuple, read_weighted_tsv(spark, str(p)).collect())
    )
    assert rows == [(2001, "a", "b", 0.5), (2002, "e", "f", -1.25)]


def test_result_sink_roundtrip(spark, tmp_path):
    wh = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [(2001, 10, 1.5), (2002, 20, 2.5)], "year int, percent int, h double"
    )
    write_result(df, wh, "entropy", partition_by=("year",))
    write_result(
        spark.createDataFrame([(2003, 30, 3.5)], "year int, percent int, h double"),
        wh,
        "entropy",
        partition_by=("year",),
    )
    got = read_result(spark, wh, "entropy")
    assert got.count() == 3
    assert got.filter(F.col("year") == 2003).count() == 1


def test_task_ledger_idempotence(spark, tmp_path):
    path = str(tmp_path / "ledger.json")
    ledger = TaskLedger(path)
    calls = []
    ledger.run_once("t1", lambda: calls.append(1))
    ledger.run_once("t1", lambda: calls.append(2))
    assert calls == [1]
    # survives restart
    ledger2 = TaskLedger(path)
    assert ledger2.is_done("t1") and not ledger2.is_done("t2")
    with pytest.raises(RuntimeError):
        ledger2.run_once("t2", lambda: (_ for _ in ()).throw(RuntimeError()))
    assert not ledger2.is_done("t2")  # failure does not mark done
