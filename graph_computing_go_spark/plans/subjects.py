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

Plan shape: neither subjects NOR years are looped over.  The snapshot year
is a row-local fan-out (``explode(filter(years, y -> y >= v.year))`` — a
vertex joins every snapshot at or after its year) and threads through every
join and aggregation as a group key, exactly like the grouped distance
complexity (PERF.md §13): ONE plan whatever the year count.  The previous
driver loop built an independent subtree per year and re-executed the
circle induction + in-degree gate once per consumer — measured 104 s at
sf0.01 for two years against ~8 s for this shape.  Edge → subject routing
is the label-intersection join (J7): an edge belongs to subject s iff both
endpoints carry s.  Total fanned row volume is |E|·years in the worst case
— identical to what the loop scanned, but in one pass with shared shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_computing_go_spark.session import eager_results


def subject_entropy_lifecycle(
    vertices: DataFrame,
    edges: DataFrame,
    years: list[int],
    min_in_degree: int = 2,
) -> DataFrame:
    """(year, subject, n_vertices, n_edges, dd_h_in, se_h_in, n_in) per
    (year, subject).

    ``vertices``: (id, year, subjects array<string>) — vertices with empty
    subject lists never join a circle; ``edges``: (src, dst).
    """
    if not years:
        schema = (
            "year int, subject string, n_vertices long, n_edges long, "
            "dd_h_in double, se_h_in double, n_in long"
        )
        return vertices.sparkSession.createDataFrame([], schema)
    n_part = int(
        vertices.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    years_arr = F.array(*[F.lit(int(y)).cast("int") for y in sorted(set(years))])
    # row-local snapshot fan-out: the lambda's `year` is the VERTEX year
    # (input attribute); the exploded alias becomes the snapshot key
    v_y = vertices.select(
        "id",
        "subjects",
        F.explode(
            F.filter(years_arr, lambda y: y >= F.col("year"))
        ).alias("year"),
    )
    mem = v_y.select("year", "id", F.explode("subjects").alias("subject"))
    circle = mem.select("year", "id").distinct()

    # circle induction, per snapshot: inner join fans each edge to the
    # years its src belongs to; the semi join keeps it only where dst is
    # in the SAME year's circle
    e_y = (
        edges.join(circle.withColumnRenamed("id", "src"), "src")
        .join(
            circle.withColumnRenamed("id", "dst"), ["year", "dst"], "left_semi"
        )
        .select("year", "src", "dst")
        .repartition(n_part, "year", "dst")
        .cache()
    )
    keep = (
        e_y.groupBy("year", F.col("dst").alias("id"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_in_degree)
        .select("year", "id")
    )
    # membership ∩ kept: probed by both sides of the subject routing AND
    # the degree ledger — cache pre-partitioned on the join key (the
    # alias-aware layout serves the src, dst, and (year, subject, id)
    # consumers' first key columns)
    memk = (
        mem.join(keep, ["year", "id"], "left_semi")
        .repartition(n_part, "year", "id")
        .cache()
    )
    es = (
        e_y.join(memk.select("year", F.col("id").alias("src"), "subject"), ["year", "src"])
        .join(
            memk.select(
                "year", F.col("id").alias("dst"), F.col("subject").alias("s_dst")
            ),
            ["year", "dst"],
        )
        .filter(F.col("subject") == F.col("s_dst"))
        .select("year", "subject", "src", "dst")
    )
    deg = es.groupBy("year", "subject", F.col("dst").alias("id")).agg(
        F.count("*").alias("d")
    )
    ind = memk.join(deg, ["year", "subject", "id"], "left").select(
        "year", "subject", F.coalesce("d", F.lit(0)).alias("d")
    )
    hist = ind.groupBy("year", "subject", "d").agg(F.count("*").alias("c"))
    dd = hist.groupBy("year", "subject").agg(
        (
            F.log2(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("dd_h_in"),
        F.sum("c").alias("n_vertices"),
    )
    se = (
        ind.filter(F.col("d") > 0)
        .select("year", "subject", F.col("d").cast("double").alias("d"))
        .groupBy("year", "subject")
        .agg(
            (
                F.log2(F.sum("d")) - F.sum(F.col("d") * F.log2("d")) / F.sum("d")
            ).alias("se_h_in"),
            F.count("*").alias("n_in"),
        )
    )
    ne = es.groupBy("year", "subject").agg(F.count("*").alias("n_edges"))
    out = (
        dd.join(se, ["year", "subject"], "left")
        .join(ne, ["year", "subject"], "left")
        .select(
            F.col("year").cast("int").alias("year"),
            "subject",
            "n_vertices",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round("dd_h_in", 6).alias("dd_h_in"),
            F.round("se_h_in", 6).alias("se_h_in"),
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
        )
    )
    # (year, subject)-grain result: materialize so the two internal caches
    # retire with the call (SPARK_GRAFT_EAGER=0 keeps it lazy for the audit)
    if eager_results():
        out = out.localCheckpoint()
        memk.unpersist()
        e_y.unpersist()
    return out
