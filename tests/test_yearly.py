"""Yearly-snapshot pipeline semantics on a hand-checkable graph.

(Value-level parity vs SQL is enforced by the driver oracle for the
testdata-derived graph; here the ladder/universe mechanics are pinned on a
graph small enough to verify by hand.)
"""

from __future__ import annotations

from graph_computing_go_spark.plans.yearly import (
    expected_slice_sizes,
    yearly_entropy_pipeline,
)


def test_yearly_pipeline_mechanics(spark):
    # vertices 1..6; years: 1,2,3 -> 2000; 4,5 -> 2001; 6 -> 2002
    vyears = {1: 2000, 2: 2000, 3: 2000, 4: 2001, 5: 2001, 6: 2002}
    vertices = spark.createDataFrame(
        [(i, y) for i, y in vyears.items()], "id long, year int"
    )
    edges = spark.createDataFrame(
        [
            (1, 2), (3, 2), (4, 2),   # in-deg(2) = 3
            (2, 3), (4, 3),           # in-deg(3) = 2
            (5, 6), (1, 6),           # in-deg(6) = 2 (vanishes before 2002)
            (6, 4),                   # in-deg(4) = 1 -> never a candidate
        ],
        "src long, dst long",
    )
    res = yearly_entropy_pipeline(
        vertices, edges, years=[2000, 2002], percents=(50, 100), min_in_degree=2
    )
    rows = {
        (r["year"], r["percent"], r["rank_type"]): r for r in res.collect()
    }
    # 2002: candidates = {2 (deg 3), 3 (deg 2), 6 (deg 2)}
    assert rows[(2002, 100, "total")]["n_vertices"] == 3
    # 50% slice = ceil(3*0.5)=2 -> {2, 3} under both universes
    assert expected_slice_sizes(3, (50,))[50] == 2
    r = rows[(2002, 50, "current")]
    # induced on {2,3}: edges 3->2 and 2->3 -> both in-degree 1
    assert r["n_vertices"] == 2 and r["n_edges"] == 2
    assert r["dd_h_in"] == 0.0 and r["se_h_in"] == 1.0 and r["n_in"] == 2
    # 2000: vertices {1,2,3}; edges among them: 1->2, 3->2, 2->3
    # current in-deg: 2->2, 3->1 -> candidates {2} only
    r = rows[(2000, 100, "current")]
    assert r["n_vertices"] == 1 and r["n_edges"] == 0
    assert r["n_in"] == 0 and r["se_h_in"] is None
    # both universes agree when the candidate set is a single vertex
    assert rows[(2000, 100, "total")]["n_vertices"] == 1


def test_null_year_vertices_in_no_snapshot(spark):
    """A NULL-year vertex passes no `year <= y` membership test, so neither
    it nor any edge touching it may enter ANY snapshot — greatest() skips
    NULLs, so without the vy null filter its edges would leak in from the
    other endpoint's year (round-5 review finding)."""
    vertices = spark.createDataFrame(
        [(1, 2000), (2, 2000), (3, 2000), (9, None)], "id long, year int"
    )
    base = [(1, 2), (3, 2), (2, 3), (1, 3)]  # in-deg: 2->2, 3->2
    dirty = base + [(9, 2), (9, 3), (1, 9), (2, 9)]  # NULL-year endpoint
    clean_res = yearly_entropy_pipeline(
        vertices.filter("year is not null"),
        spark.createDataFrame(base, "src long, dst long"),
        years=[2001],
        percents=(100,),
        min_in_degree=2,
    )
    dirty_res = yearly_entropy_pipeline(
        vertices,
        spark.createDataFrame(dirty, "src long, dst long"),
        years=[2001],
        percents=(100,),
        min_in_degree=2,
    )
    key = ["year", "percent", "rank_type"]
    clean = {tuple(r[k] for k in key): r.asDict() for r in clean_res.collect()}
    dirty_rows = {
        tuple(r[k] for k in key): r.asDict() for r in dirty_res.collect()
    }
    assert clean == dirty_rows  # vertex 9 and its edges are invisible
