"""Golden parity with /root/reference/internal/distanceComplexity/distanceComplexity_test.go."""

from __future__ import annotations

import pytest

from graph_computing_go_spark.functions import distance_complexity
from tests.conftest import vert_df, wedge_df

V1_EDGES = [(1, 2, 1), (1, 3, 2), (1, 4, 3), (2, 3, 1), (2, 4, 2), (3, 4, 3)]
V1_CATS = {1: ["a"], 2: ["a"], 3: ["b"], 4: ["b"]}

V3_EDGES = V1_EDGES + [(4, 5, 4)]
V3_CATS = {**V1_CATS, 5: ["b"]}

V2_EDGES = [
    (1, 2, 1), (1, 3, 2), (1, 4, 3), (1, 5, 2), (1, 6, 2),
    (2, 3, 1), (2, 4, 2), (2, 5, 1), (2, 6, 1),
    (3, 4, 1), (3, 5, 2), (3, 6, 2),
    (4, 5, 3), (4, 6, 3), (5, 6, 2),
]
V2_CATS = {1: ["a"], 2: ["a"], 3: ["b"], 4: ["b"], 5: ["b"], 6: ["b"]}

GOLDENS = [
    (V1_EDGES, V1_CATS, 1.4999999999999998, 1.861654167),
    (V3_EDGES, V3_CATS, 1.4693609377704333, 1.513679924),
    (V2_EDGES, V2_CATS, 2.2438900508, 2.184720099868397),
]


@pytest.mark.parametrize("edges,cats,big,little", GOLDENS, ids=["V1", "V3", "V2"])
def test_distance_complexity_goldens(spark, edges, cats, big, little):
    row = distance_complexity(
        wedge_df(spark, edges), vert_df(spark, cats)
    ).collect()[0]
    assert row["big"] == pytest.approx(big, abs=1e-9)
    assert row["little"] == pytest.approx(little, abs=1e-9)


def test_distance_complexity_no_categories(spark):
    row = distance_complexity(wedge_df(spark, V1_EDGES)).collect()[0]
    assert row["big"] == pytest.approx(1.4999999999999998, abs=1e-9)
    assert row["little"] is None


# multi-category variants exercise the cross-category copy quirk per group
V1_CATS_MULTI = {1: ["a", "c"], 2: ["a"], 3: ["b"], 4: ["b", "c"]}
V2_CATS_MULTI = {1: ["a"], 2: ["a", "c"], 3: ["b"], 4: ["b"], 5: ["b", "a"], 6: ["b"]}


def test_grouped_equals_per_group(spark):
    """The grouped plan (one invocation, group keys threaded through every
    aggregation) must equal independent per-group invocations — including
    graphs whose nodes carry 2+ categories (the copy path)."""
    from pyspark.sql import functions as F

    graphs = {
        ("2008", "math"): (V1_EDGES, V1_CATS_MULTI),
        ("2008", "bio"): (V2_EDGES, V2_CATS_MULTI),
        ("2019", "math"): (V3_EDGES, V3_CATS),
    }
    wedges = None
    cats = None
    for (yr, disc), (edges, cmap) in graphs.items():
        w = wedge_df(spark, edges).select(
            F.lit(yr).alias("year"), F.lit(disc).alias("discipline"), "*"
        )
        c = vert_df(spark, cmap).select(
            F.lit(yr).alias("year"), F.lit(disc).alias("discipline"), "*"
        )
        wedges = w if wedges is None else wedges.unionByName(w)
        cats = c if cats is None else cats.unionByName(c)

    got = {
        (r["year"], r["discipline"]): (r["big"], r["little"])
        for r in distance_complexity(
            wedges, cats, group=["year", "discipline"]
        ).collect()
    }
    assert set(got) == set(graphs)
    for key, (edges, cmap) in graphs.items():
        solo = distance_complexity(
            wedge_df(spark, edges), vert_df(spark, cmap)
        ).collect()[0]
        assert got[key][0] == pytest.approx(solo["big"], abs=1e-9), key
        assert got[key][1] == pytest.approx(solo["little"], abs=1e-9), key
