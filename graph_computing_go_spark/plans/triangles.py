"""Triangle counting — join-only plan (north rule; public spec: the
canonical-orientation wedge join, cf. Suri & Vassilvitskii 2011).

Canonicalize the undirected graph to src < dst, then a triangle
(a < b < c) is counted exactly once by

    e(a,b) ⋈ e(b,c) ⋈ e(a,c)

Two shuffles (wedge build on b, closure probe on (a,c)).  For skewed
degree distributions the classic refinement is orienting edges from the
lower-degree endpoint to the higher-degree one, which bounds wedge fan-out
by sqrt(m) per vertex — exposed via ``degree_oriented=True`` (the global
count is identical; the per-vertex attribution still reports the original
vertex ids because triangles are exploded back to their three corners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def _oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower-degree to higher-degree
    endpoint (ties by id), bounding per-vertex out-degree ~ sqrt(m)."""
    canon = _canonical_edges(edges)
    # explode both endpoints in ONE scan — the union-of-two-selects form
    # executed the canonicalizing distinct twice for identical shuffle bytes
    deg = (
        canon.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        canon.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
    )
    keep = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(keep, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(keep, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangle_list(edges: DataFrame, degree_oriented: bool = False) -> DataFrame:
    """(a, b, c) one row per distinct triangle.

    With ``degree_oriented`` the three corners are returned sorted
    (x < y < z) so output is identical either way.
    """
    e = _oriented_edges(edges) if degree_oriented else _canonical_edges(edges)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(e3, ["x", "z"], "left_semi")
    if degree_oriented:
        # The orientation is consistent with a total order on (deg, id), so
        # the closure edge of a wedge x→y→z is always oriented x→z; re-sort
        # the corners by id so output matches the canonical variant.
        return tri.select(
            F.least("x", "y", "z").alias("a"),
            F.least(F.greatest("x", "y"), F.greatest("y", "z"), F.greatest("x", "z")).alias("b"),
            F.greatest("x", "y", "z").alias("c"),
        )
    return tri.select(
        F.col("x").alias("a"), F.col("y").alias("b"), F.col("z").alias("c")
    )


def triangle_count(edges: DataFrame, degree_oriented: bool = False) -> DataFrame:
    """One row (n_triangles)."""
    return triangle_list(edges, degree_oriented).agg(
        F.count("*").alias("n_triangles")
    )


def triangles_per_vertex(
    edges: DataFrame, degree_oriented: bool = False
) -> DataFrame:
    """(id, n_triangles) — triangles exploded back to their three corners.
    ``degree_oriented`` switches the enumeration to the sqrt(m)-bounded
    oriented wedge join; output is identical."""
    tri = triangle_list(edges, degree_oriented)
    # one corner explode, ONE execution of the wedge join — the three-way
    # union re-ran the whole triangle enumeration once per corner column
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
    return corners.groupBy("id").agg(F.count("*").alias("n_triangles"))
