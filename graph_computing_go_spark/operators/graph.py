"""Graph-shaping operators: edge derivation, induction, ranking, dedup.

Covers the reference's join/filter/rank stages (SURVEY.md §2.2-2.7):

- subgraph induction by vertex membership — hashset semi-joins in the
  reference (/root/reference/internal/wikiEntropy/wikiEntropy.go:122-153,
  internal/openAlexEntropy/openAlexEntropy.go:314-339) → ``left_semi`` joins.
- graph shrink + current in-degree (openAlexEntropy.go:341-363).
- top-k-percent slice over an in-degree ranking with the {10..100} percent
  ladder (wikiEntropy.go:281-310, openAlexEntropy.go:376-394): the reference
  sorts once and re-slices the array; we rank once and re-filter the ranked
  DataFrame — one sort, six filters.
- dedup-with-preference (wikiEntropy.go:163-184) → window ``row_number``.
- min-in-degree filter (openAlexEntropy.go:365-374).
- canonical undirected edge orientation (distanceComplexity.go:50-62).

The derived testdata graph (``derive_edges``/``derive_wedges``) is the shared
link graph used by the driver-facing queries and the benchmark: vertex ids are
modular residues of lineitem's (orderkey, partkey) pairs, which is
deterministic, engine-portable (same SQL runs in DuckDB), and produces a
well-connected multigraph with hub vertices at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: modulus used to fold lineitem keys into a bounded vertex id space
GRAPH_MOD = 500


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derive_raw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed multigraph (src, dst) folded from lineitem; self-loops dropped
    (the reference drops self-links, wikiEntropy.go:266)."""
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        (F.col("l_orderkey") % GRAPH_MOD).cast("long").alias("src"),
        (F.col("l_partkey") % GRAPH_MOD).cast("long").alias("dst"),
    )
    return e.filter(F.col("src") != F.col("dst"))


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed edge table (src, dst)."""
    return derive_raw_edges(spark, sf_dir).distinct()


def derive_wedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted undirected edges (a=max, b=min, distance=multiplicity) —
    canonical single-orientation storage like the reference's distance graphs
    (distanceComplexity.go:50-62)."""
    raw = derive_raw_edges(spark, sf_dir)
    return (
        raw.select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("distance"))
    )


def induce_subgraph(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Keep edges with BOTH endpoints in ``vertices(id)`` — two left-semi
    joins; AQE broadcasts the vertex set when it is small."""
    v = vertices.select("id").distinct()
    return edges.join(
        v.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(v.withColumnRenamed("id", "dst"), "dst", "left_semi")


def shrink(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Graph shrink: drop edges whose dst left the vertex set, return the
    surviving edges (openAlexEntropy.go:341-353 keeps src rows and prunes
    their adjacency; in edge-table form that is a dst-side semi join)."""
    return edges.join(
        vertices.select("id").withColumnRenamed("id", "dst"), "dst", "left_semi"
    )


def current_in_degree(edges: DataFrame) -> DataFrame:
    """(id, cnt) in-degree over the current edge set
    (openAlexEntropy.go:352-356)."""
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("cnt"))


def min_in_degree_filter(edges: DataFrame, min_deg: int = 2) -> DataFrame:
    """Vertices with in-degree >= min_deg (openAlexEntropy.go:365-374;
    policy readme.md:52)."""
    return current_in_degree(edges).filter(F.col("cnt") >= min_deg).select("id")


def rank_by_in_degree(edges: DataFrame) -> DataFrame:
    """(id, cnt, rank, n_total): dense global ranking by in-degree desc,
    deterministic tie-break by id asc (the reference's slices.SortFunc is
    also deterministic on the insertion order of equal keys; we pin ties by
    id so goldens are stable, SURVEY §7 hard-part 1).

    Scale note: ``Window.orderBy`` with no partition key collapses to one
    task.  The ranked table here is vertex-grain (|V| rows, orders of
    magnitude smaller than |E| after the in-degree aggregation), so a single
    ordered partition of longs is acceptable even at 10^9 vertices; if not,
    swap to orderBy + per-partition offsets (SURVEY §4 note) without
    changing callers.
    """
    indeg = current_in_degree(edges)
    w = Window.orderBy(F.desc("cnt"), F.asc("id"))
    total = indeg.count()
    return indeg.select(
        "id", "cnt", F.row_number().over(w).alias("rank"), F.lit(total).alias("n_total")
    )


def top_percent(ranked: DataFrame, percent: int) -> DataFrame:
    """ceil(N*p/100)-prefix slice of a ranked vertex table
    (wikiEntropy.go:306-308: ``int(math.Ceil(float64(len)*percent/100))``)."""
    return ranked.filter(
        F.col("rank") <= F.ceil(F.col("n_total") * percent / 100)
    ).select("id", "cnt", "rank")


def percent_ladder_stats(
    edges: DataFrame, percents: tuple[int, ...] = (10, 20, 40, 60, 80, 100)
) -> DataFrame:
    """Per ladder point: induced-subgraph vertex/edge counts, one ranked
    window reused for every slice (the reference re-slices one sorted array,
    wikiEntropy.go:86-95).  Returns (percent, n_vertices, n_edges)."""
    ranked = rank_by_in_degree(edges).cache()
    edges = edges.cache()
    outs = []
    for p in percents:
        vs = top_percent(ranked, p)
        sub = induce_subgraph(edges, vs)
        outs.append(
            sub.agg(
                F.lit(p).alias("percent"),
                F.count("*").alias("n_edges"),
            ).crossJoin(vs.agg(F.count("*").alias("n_vertices")))
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select("percent", "n_vertices", "n_edges")


def dedup_prefer(
    df: DataFrame, key: str, order_cols: list, keep: int = 1
) -> DataFrame:
    """Keep the best ``keep`` rows per ``key`` under ``order_cols`` ordering —
    the reference's non-redirect-wins map insertion (wikiEntropy.go:163-184)
    as a window dedup (J2)."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )
