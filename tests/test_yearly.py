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


def _brute_yearly(vrows, erows, years, percents, min_in_degree):
    """Driver-side pure-Python reference for yearly_entropy_pipeline:
    per-year kept graph (both endpoint years <= y, NULL excluded), candidate
    gate on current in-degree, per-universe dense rank (count desc, id asc),
    ladder minp via ceil(n*p/100) prefixes, edge slice = max endpoint minp,
    entropies over the in-degree histogram (dd incl. zeros, se over d>0)."""
    import math
    from collections import Counter

    vy = {i: y for i, y in vrows if y is not None}
    total = Counter(d for _, d in erows)  # raw edges: matches total_indeg
    out = []
    for year in years:
        ey = [
            (s, d)
            for s, d in erows
            if s in vy and d in vy and max(vy[s], vy[d]) <= year
        ]
        cur = Counter(d for _, d in ey)
        cand = sorted(i for i in cur if cur[i] >= min_in_degree)
        n = len(cand)
        if n == 0:
            continue
        for rank_type in ("total", "current"):
            cnt = {
                i: (total.get(i, 0) if rank_type == "total" else cur[i])
                for i in cand
            }
            rank = {
                i: r + 1
                for r, i in enumerate(sorted(cand, key=lambda i: (-cnt[i], i)))
            }
            minp = {
                i: next(
                    p
                    for p in sorted(percents)
                    if rank[i] <= math.ceil(n * p / 100)
                )
                for i in cand
            }
            for p in sorted(percents):
                sl = [i for i in cand if minp[i] <= p]
                es = [
                    (s, d)
                    for s, d in ey
                    if s in minp and d in minp and max(minp[s], minp[d]) <= p
                ]
                d_in = Counter(d for _, d in es)
                degs = [d_in.get(i, 0) for i in sl]
                hist = Counter(degs)
                dd = (
                    math.log2(len(sl))
                    - sum(c * math.log2(c) for c in hist.values()) / len(sl)
                )
                pos = [d for d in degs if d > 0]
                s_ = sum(pos)
                se = (
                    math.log2(s_) - sum(d * math.log2(d) for d in pos) / s_
                    if pos
                    else None
                )
                out.append(
                    (year, p, rank_type, len(sl), len(es), dd, se, len(pos))
                )
    return sorted(out, key=lambda t: t[:3])


def test_yearly_pipeline_matches_brute_force_on_random_graphs(spark):
    """Seeded random graphs (multi-edges, self-loops, NULL years) vs a
    driver-side pure-Python reference — independent of both the Spark plan
    shape and the SQL oracle, so the cumulative-membership algebra of the
    round-5 rewrite is pinned against first-principles semantics."""
    import math
    import random

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        vrows = [
            (i, None if rng.random() < 0.1 else 2000 + rng.randrange(4))
            for i in range(50)
        ]
        erows = [
            (rng.randrange(50), rng.randrange(50)) for _ in range(300)
        ]
        years, percents, mind = [2001, 2003], (30, 60, 100), 2
        vertices = spark.createDataFrame(vrows, "id long, year int")
        edges = spark.createDataFrame(erows, "src long, dst long")
        got = sorted(
            (
                tuple(r)
                for r in yearly_entropy_pipeline(
                    vertices, edges, years=years, percents=percents,
                    min_in_degree=mind,
                ).collect()
            ),
            key=lambda t: t[:3],
        )
        want = _brute_yearly(vrows, erows, years, percents, mind)
        assert len(got) == len(want), f"seed {seed}: row count"
        for g, w in zip(got, want):
            assert g[:5] == w[:5], f"seed {seed}: keys/counts {g} vs {w}"
            assert g[7] == w[7], f"seed {seed}: n_in {g} vs {w}"
            for gi, wi in (  # rounded Spark value vs unrounded reference
                (g[5], w[5]),
                (g[6], w[6]),
            ):
                if wi is None:
                    assert gi is None, f"seed {seed}: {g} vs {w}"
                else:
                    assert math.isclose(gi, wi, abs_tol=2e-6), (
                        f"seed {seed}: {g} vs {w}"
                    )


def test_empty_years_and_no_100_ladder(spark):
    """years=[] returns a typed empty result without running tagging jobs;
    a ladder omitting 100 leaves beyond-ladder candidates (NULL minp) in NO
    slice — their edges must not leak into the other endpoint's slices via
    NULL-skipping greatest() (round-5 review finding)."""
    v = spark.createDataFrame(
        [(i, 2000) for i in range(1, 7)], "id long, year int"
    )
    e = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2), (5, 2), (2, 3), (4, 3), (5, 3), (2, 4), (3, 4)],
        "src long, dst long",
    )
    empty = yearly_entropy_pipeline(v, e, years=[])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "year", "percent", "rank_type", "n_vertices", "n_edges",
        "dd_h_in", "se_h_in", "n_in",
    ]
    # in-deg: 2->4, 3->3, 4->2; ceil(3*34/100)=2 -> candidate 4 beyond the
    # ladder in both universes (total ranks agree here)
    r = yearly_entropy_pipeline(
        v, e, years=[2000], percents=(34,), min_in_degree=2
    )
    rows = {x["rank_type"]: x.asDict() for x in r.collect()}
    for rt in ("current", "total"):
        # slice {2,3}: edges 3->2 and 2->3 only — 4's edges are invisible
        assert rows[rt]["n_vertices"] == 2 and rows[rt]["n_edges"] == 2, rows
        assert rows[rt]["n_in"] == 2
