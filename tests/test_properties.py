"""Property-based tests (hypothesis) — the engine's analogue of the
reference's generated-graph sanity checks (lab/test.ipynb cells 8-9 feed
random BA graphs through the entropy functions; SURVEY.md §5).

Each property is checked against an independent numpy/pure-python
computation on randomly drawn small graphs.  deadline=None because Spark
job latency is orders beyond hypothesis' default budget; examples are kept
small and few.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_computing_go_spark.functions.distance_complexity import distance_complexity
from graph_computing_go_spark.functions.entropy import structural_entropy
from graph_computing_go_spark.plans import connected_components, pagerank

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def edge_lists(draw, max_n=12, max_m=30):
    n = draw(st.integers(min_value=2, max_value=max_n))
    m = draw(st.integers(min_value=1, max_value=max_m))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=m,
            unique=True,
        )
    )
    return edges


def _entropy(degs):
    pos = [d for d in degs if d > 0]
    if not pos:
        return None
    s = sum(pos)
    return -sum((d / s) * math.log2(d / s) for d in pos)


@given(edges=edge_lists())
@SETTINGS
def test_structural_entropy_matches_formula(spark, edges):
    from tests.conftest import edge_df

    row = structural_entropy(edge_df(spark, edges)).collect()[0]
    indeg = Counter(d for _, d in edges)
    want = _entropy(list(indeg.values()))
    assert math.isclose(row["h_in"], want, abs_tol=1e-9)
    # entropy of a degree sequence is bounded by log2(#positive-degree nodes)
    assert row["h_in"] <= math.log2(max(row["n_in"], 1)) + 1e-9


@given(edges=edge_lists())
@SETTINGS
def test_pagerank_is_a_distribution(spark, edges):
    from tests.conftest import edge_df

    ranks, _ = pagerank(edge_df(spark, edges), tol=0.0, max_iter=6)
    vals = [r["rank"] for r in ranks.collect()]
    assert math.isclose(sum(vals), 1.0, abs_tol=1e-9)  # redistribute keeps mass
    assert all(v > 0 for v in vals)


@given(edges=edge_lists())
@SETTINGS
def test_connected_components_invariants(spark, edges):
    from tests.conftest import edge_df

    comps, _ = connected_components(edge_df(spark, edges))
    label = {r["id"]: r["component"] for r in comps.collect()}
    # endpoints of every edge share a component; labels are component minima
    for s, d in edges:
        assert label[s] == label[d]
    for v, c in label.items():
        assert c <= v
        assert label[c] == c  # the representative is its own label


@given(
    wedges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=8),
            st.floats(min_value=0.1, max_value=10.0, allow_nan=False),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
        unique_by=lambda e: (max(e[0], e[1]), min(e[0], e[1])),
    )
)
@SETTINGS
def test_distance_complexity_big_matches_python(spark, wedges):
    from tests.conftest import wedge_df

    row = distance_complexity(wedge_df(spark, wedges)).collect()[0]
    incident: dict[int, list[float]] = {}
    for a, b, w in wedges:
        incident.setdefault(a, []).append(w)
        incident.setdefault(b, []).append(w)
    g = sum(sum(v) for v in incident.values())
    big = 0.0
    for ws in incident.values():
        r = sum(ws)
        h = -sum((w / r) * math.log2(w / r) for w in ws)
        big += h * r / g
    assert math.isclose(row["big"], big, abs_tol=1e-9)
