"""Normalized Google distance over in-neighbor sets — reference op A9/J6.

Spec: /root/reference/internal/wikipediaGoogleDistance/wikipediaGoogleDistance.go:91-136

    d(a,b) = (log2 max(|A|,|B|) - log2 |A n B|) / (log2 N - log2 min(|A|,|B|))

where A, B are the (distinct) in-neighbor sets of two "core" vertices, N is
the total page count (ALL pages, including redirects — :94), and pairs with
empty intersection are skipped (:113-115).  Output keyed (a < b).

The reference materializes per-vertex hashsets and runs an O(core^2) double
loop (:95-137).  Spark-first formulation: never materialize the sets —
co-occurrence counting via a self-equi-join on the shared in-neighbor:

    inedges(src, dst) |> self-join on src with dst_l < dst_r
                      |> groupBy(dst_l, dst_r).count()

The join key is the *in-neighbor*, so a hub source that links to k core pages
fans out to k*(k-1)/2 pairs — that is the true output size, not avoidable;
AQE skew-join splitting plus a pre-aggregation per (src) keeps partitions
bounded.  Distinct-ification of (src, dst) happens once up front (the
reference's hashsets dedup implicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def google_distance(
    edges: DataFrame,
    core_vertices: DataFrame,
    total_count: int,
) -> DataFrame:
    """(a, b, inter, deg_a, deg_b, distance) for core pairs with overlap.

    ``edges``: (src, dst) resolved link table (sources already filtered the
    way the caller wants — the reference uses non-redirect pages only).
    ``core_vertices``: single column ``id`` — the vertex subset to compare
    (core_subject_tag pages in the reference, :66-68).
    ``total_count``: N in the formula (len(pageMap), :94).
    """
    core = core_vertices.select("id").distinct()
    inedges = (
        edges.join(F.broadcast(core).withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
        .distinct()
    )
    indeg = inedges.groupBy("dst").agg(F.count("*").alias("deg"))

    l = inedges.select(F.col("src"), F.col("dst").alias("a"))
    r = inedges.select(F.col("src"), F.col("dst").alias("b"))
    pairs = (
        l.join(r, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(indeg.select(F.col("dst").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(indeg.select(F.col("dst").alias("b"), F.col("deg").alias("deg_b")), "b")
    )
    log_n = F.log2(F.lit(float(total_count)))
    return out.select(
        "a",
        "b",
        "inter",
        "deg_a",
        "deg_b",
        (
            (F.log2(F.greatest("deg_a", "deg_b").cast("double")) - F.log2(F.col("inter").cast("double")))
            / (log_n - F.log2(F.least("deg_a", "deg_b").cast("double")))
        ).alias("distance"),
    )
