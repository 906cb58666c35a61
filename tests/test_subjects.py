"""Grouped subject-entropy lifecycle: the one-plan year-threaded rewrite
must reproduce the per-year loop semantics exactly (VERDICT-style grouped
== per-group pin, same as test_goldens_distance's grouped check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_computing_go_spark.plans.subjects import subject_entropy_lifecycle


def _loop_reference(vertices, edges, years, min_in_degree=2):
    """The pre-rewrite per-year driver loop, kept as the semantic oracle."""
    rows = []
    for y in sorted(set(years), reverse=True):
        mem = vertices.filter(F.col("year") <= y).select(
            "id", F.explode("subjects").alias("subject")
        )
        circle = mem.select("id").distinct()
        e_y = (
            edges.join(circle.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(circle.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        keep = (
            e_y.groupBy(F.col("dst").alias("id"))
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= min_in_degree)
            .select("id")
        )
        memk = mem.join(keep, "id", "left_semi")
        es = (
            e_y.join(memk.select(F.col("id").alias("src"), "subject"), "src")
            .join(
                memk.select(F.col("id").alias("dst"), F.col("subject").alias("s2")),
                "dst",
            )
            .filter(F.col("subject") == F.col("s2"))
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
        for r in (
            dd.join(se, "subject", "left").join(ne, "subject", "left").collect()
        ):
            rows.append(
                (
                    y,
                    r["subject"],
                    r["n_vertices"],
                    r["n_edges"] or 0,
                    round(r["dd_h_in"], 6),
                    round(r["se_h_in"], 6) if r["se_h_in"] is not None else None,
                    r["n_in"] or 0,
                )
            )
    return sorted(rows)


def test_grouped_lifecycle_equals_per_year_loop(spark):
    # 40 vertices over 4 years, 3 overlapping subjects, a hub, and a vertex
    # below the min-in-degree gate in the early snapshot only
    vertices = spark.range(40).select(
        F.col("id"),
        (F.lit(2000) + (F.col("id") % 4).cast("int")).alias("year"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.array(F.lit("a"))).otherwise(
                F.array().cast("array<string>")
            ),
            F.when(F.col("id") % 3 == 0, F.array(F.lit("b"))).otherwise(
                F.array().cast("array<string>")
            ),
            F.when(F.col("id") % 7 == 0, F.array(F.lit("c"))).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("subjects"),
    )
    edges = spark.range(160).select(
        (F.col("id") % 40).alias("src"),
        F.pmod(F.col("id") * 13 + 7, F.lit(40)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    years = [2001, 2003]
    got = sorted(
        map(tuple, subject_entropy_lifecycle(vertices, edges, years).collect())
    )
    want = _loop_reference(vertices, edges, years)
    assert got == want
    # snapshots are cumulative: the later year's circle is a superset
    by_year = {}
    for r in got:
        by_year.setdefault(r[0], 0)
        by_year[r[0]] += r[2]
    assert by_year[2003] >= by_year[2001]
