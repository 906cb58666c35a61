"""Per-subject entropy lifecycle — the reference's subject-sliced walk
(/root/reference/internal/wikiEntropy/wikiSubjectEntropy.go:64-95,
internal/openAlexEntropy/openAlexMultilayerSubjectEntropy.go:130-160).

Per year y (descending):

1. per-subject membership: subject-tagged vertices with year <= y
   (the reference's per-subject worksMap year filter, :132-140);
2. "academic circle": the union of every subject's vertex set (:142-148);
3. shrink the edge table to the circle (worksShrink, both endpoints kept);
4. min-in-degree filter ON THE CIRCLE GRAPH (filterWorksByLinksIn, :151-153
   — applied once to the circle, explicitly NOT per subject, a quirk the
   reference comments on);
5. per subject: the induced subgraph over (subject members ∩ kept) and its
   degree-distribution + structural in-degree entropies.

Plan shape: subjects are never looped over — membership is exploded to
(subject, id) rows once and every per-subject statistic is ONE grouped
aggregation keyed by subject (the reference spawns a goroutine per subject;
the shuffle gives Catalyst the same parallelism).  Edge → subject routing is
the label-intersection join (J7): an edge belongs to subject s iff both
endpoints carry s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_computing_go_spark.operators.graph import (
    current_in_degree,
    induce_subgraph,
)


def subject_entropy_lifecycle(
    vertices: DataFrame,
    edges: DataFrame,
    years: list[int],
    min_in_degree: int = 2,
) -> DataFrame:
    """(year, subject, n_vertices, n_edges, dd_h_in, se_h_in, n_in) per
    (year desc, subject).

    ``vertices``: (id, year, subjects array<string>) — vertices with empty
    subject lists never join a circle; ``edges``: (src, dst).
    """
    if not years:
        schema = (
            "year int, subject string, n_vertices long, n_edges long, "
            "dd_h_in double, se_h_in double, n_in long"
        )
        return vertices.sparkSession.createDataFrame([], schema)
    out: list[DataFrame] = []
    for y in sorted(years, reverse=True):
        mem = vertices.filter(F.col("year") <= y).select(
            "id", F.explode("subjects").alias("subject")
        )
        circle = mem.select("id").distinct()
        e_y = induce_subgraph(edges, circle)
        keep = (
            current_in_degree(e_y)
            .filter(F.col("cnt") >= min_in_degree)
            .select("id")
        )
        memk = mem.join(keep, "id", "left_semi")
        es = (
            e_y.join(memk.select(F.col("id").alias("src"), "subject"), "src")
            .join(
                memk.select(
                    F.col("id").alias("dst"), F.col("subject").alias("s_dst")
                ),
                "dst",
            )
            .filter(F.col("subject") == F.col("s_dst"))
            .select("subject", "src", "dst")
        )
        deg = es.groupBy("subject", F.col("dst").alias("id")).agg(
            F.count("*").alias("d")
        )
        ind = memk.join(deg, ["subject", "id"], "left").select(
            "subject", F.coalesce("d", F.lit(0)).alias("d")
        )
        hist = ind.groupBy("subject", "d").agg(F.count("*").alias("c"))
        dd = hist.groupBy("subject").agg(
            (
                F.log2(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
            ).alias("dd_h_in"),
            F.sum("c").alias("n_vertices"),
        )
        se = (
            ind.filter(F.col("d") > 0)
            .select("subject", F.col("d").cast("double").alias("d"))
            .groupBy("subject")
            .agg(
                (
                    F.log2(F.sum("d"))
                    - F.sum(F.col("d") * F.log2("d")) / F.sum("d")
                ).alias("se_h_in"),
                F.count("*").alias("n_in"),
            )
        )
        ne = es.groupBy("subject").agg(F.count("*").alias("n_edges"))
        out.append(
            dd.join(se, "subject", "left")
            .join(ne, "subject", "left")
            .select(
                F.lit(y).alias("year"),
                "subject",
                "n_vertices",
                F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
                F.round("dd_h_in", 6).alias("dd_h_in"),
                F.round("se_h_in", 6).alias("se_h_in"),
                F.coalesce("n_in", F.lit(0)).alias("n_in"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
