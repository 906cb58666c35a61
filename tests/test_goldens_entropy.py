"""Golden parity with the reference's entropy unit tests.

Fixtures and expected values ported from
/root/reference/internal/entropy/entropy_test.go:9-32 (+-1e-9) and the
notebook executable specs /root/reference/lab/test.ipynb cells 1-3,7.
"""

from __future__ import annotations

import math

import pytest

from graph_computing_go_spark.functions import (
    degree_distribution_entropy,
    multilayer_structural_entropy,
    structural_entropy,
)
from tests.conftest import edge_df, vert_df

OUTS = {1: [2, 3], 2: [3, 4, 5], 3: [4, 6], 4: [1, 6], 5: [4, 6], 6: [1, 2, 4]}
EDGES = [(u, v) for u, os_ in OUTS.items() for v in os_]


def test_layer_graph_v1(spark):
    verts = vert_df(spark, {1: ["a"], 2: ["a"], 3: ["a"], 4: ["b"], 5: ["b"], 6: ["b"]})
    row = multilayer_structural_entropy(verts, edge_df(spark, EDGES)).collect()[0]
    assert row["little"] == pytest.approx(1.504751568, abs=1e-9)


def test_layer_graph_v2_cross_category_copy(spark):
    verts = vert_df(
        spark, {1: ["a"], 2: ["a"], 3: ["a", "b"], 4: ["b"], 5: ["b"], 6: ["b"]}
    )
    row = multilayer_structural_entropy(verts, edge_df(spark, EDGES)).collect()[0]
    assert row["little"] == pytest.approx(1.612197223, abs=1e-9)
    assert row["big"] == pytest.approx(2.636056086, abs=1e-9)


# ---- notebook spot checks (lab/test.ipynb cells 2,3,7) --------------------

CASES = [
    [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
    [(1, 2), (1, 3), (4, 1), (2, 3), (4, 2), (4, 3)],
    [(0, 1), (1, 2), (2, 1), (3, 4), (4, 5), (6, 4), (7, 4)],
]


def _notebook_oracle(edges):
    """Literal re-run of handle_entropy_value (lab/test.ipynb cell 1)."""
    import collections

    d = {}
    for a, b in edges:
        d.setdefault(a, {"i": [], "o": []})
        d.setdefault(b, {"i": [], "o": []})
        d[a]["o"].append(b)
        d[b]["i"].append(a)

    def hist_entropy(counts):
        n = sum(counts)
        return -sum(c / n * math.log2(c / n) for c in counts)

    in_h = collections.Counter(len(o["i"]) for o in d.values())
    out_h = collections.Counter(len(o["o"]) for o in d.values())
    all_h = collections.Counter(
        len(o["i"]) + len(o["o"]) for o in d.values() if len(o["i"]) + len(o["o"]) > 0
    )
    dd = (hist_entropy(in_h.values()), hist_entropy(out_h.values()), hist_entropy(all_h.values()))

    def seq_entropy(vals):
        s = sum(vals)
        return -sum(v / s * math.log2(v / s) for v in vals), len(vals)

    i_seq = [len(o["i"]) for o in d.values() if o["i"]]
    o_seq = [len(o["o"]) for o in d.values() if o["o"]]
    a_seq = [len(o["i"]) + len(o["o"]) for o in d.values() if o["i"] or o["o"]]
    return dd, [seq_entropy(x) for x in (i_seq, o_seq, a_seq)]


@pytest.mark.parametrize("edges", CASES, ids=["cycle5", "dag6", "two-comps"])
def test_notebook_entropies(spark, edges):
    dd, se = _notebook_oracle(edges)
    e = edge_df(spark, edges)
    row = degree_distribution_entropy(e).collect()[0]
    assert row["h_in"] == pytest.approx(dd[0], abs=1e-9)
    assert row["h_out"] == pytest.approx(dd[1], abs=1e-9)
    assert row["h_all"] == pytest.approx(dd[2], abs=1e-9)

    row = structural_entropy(e).collect()[0]
    for (h, n), suffix in zip(se, ("in", "out", "all")):
        assert row[f"h_{suffix}"] == pytest.approx(h, abs=1e-9)
        assert row[f"n_{suffix}"] == n
        e_min = math.log2(4 * (n - 1)) / 2
        want_norm = (h - e_min) / (math.log2(n) - e_min)
        assert row[f"norm_{suffix}"] == pytest.approx(want_norm, abs=1e-9)


def test_cycle_exact_values(spark):
    """5-cycle: every in-degree 1 -> dd entropy 0, struct entropy log2(5)."""
    e = edge_df(spark, CASES[0])
    row = degree_distribution_entropy(e).collect()[0]
    assert row["h_in"] == pytest.approx(0.0, abs=1e-12)
    row = structural_entropy(e).collect()[0]
    assert row["h_in"] == pytest.approx(math.log2(5), abs=1e-12)
