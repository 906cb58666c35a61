"""Yearly-snapshot entropy pipeline — the reference's flagship lifecycle
(`oae -t total`, /root/reference/internal/openAlexEntropy/openAlexEntropy.go:136-311).

Per year y (descending, like the reference's 2024→1940 walk):

1. year filter: keep vertices with year <= y (:240-247);
2. shrink: drop edges whose endpoint left (:341-363) — the edge table is
   filtered INCREMENTALLY (year y's edges derive from year y+1's, mirroring
   ``worksMap = worksShrink(...)`` at :252 — a cache-reuse optimization the
   optimizer cannot infer, SURVEY.md §4 "cached/incremental dataset reuse");
3. min-in-degree >= 2 filter on the rank candidates (:260, readme.md:52);
4. TWO rank universes (:255-272): "total" ranks by the all-time in-degree,
   "current" by this year's in-degree;
5. percent ladder {10..100} (:54-108);
6. per slice: induce the subgraph and compute in-degree degree-distribution
   entropy + structural entropy (:288-301), one result row per
   (year, percent, rank_type).

**Plan shape (the scale-critical part).** The reference loops over slices;
a naive port runs 4 jobs × |years|·|ladder|·2 slices.  Instead the ladder
is vectorized: because slices are NESTED (top-10% ⊂ top-20% ⊂ …), each
vertex gets ``minp`` = the smallest ladder point containing it, each edge
``minp_e = max(minp_src, minp_dst)``, and exploding memberships
(p >= minp) turns ALL slices of a universe into one grouped aggregation —
5 shuffles per (year, universe) instead of ~24, with identical results.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_computing_go_spark.operators.graph import (
    global_row_number,
    rank_partitions_for,
)


def _minp_expr(rank_col, n_col, percents: tuple[int, ...]):
    """Smallest ladder point whose ceil(n*p/100) prefix contains this rank
    (ladder ascending; the p=100 slice contains every candidate)."""
    expr = None
    branches = []
    for p in sorted(percents):
        branches.append((F.col(rank_col) <= F.ceil(F.col(n_col) * p / 100), p))
    expr = F.when(branches[0][0], F.lit(branches[0][1]))
    for cond, p in branches[1:]:
        expr = expr.when(cond, F.lit(p))
    return expr


def _universe_stats(
    edges_y: DataFrame,
    ranked: DataFrame,
    year: int,
    percents: tuple[int, ...],
) -> DataFrame:
    """Slice stats for BOTH rank universes in one subtree: ``ranked`` is
    (id, rank_type, rank, n_total) and ``rank_type`` threads through every
    join and aggregation as a group key — the tag joins, slice explosions,
    and entropy aggregations are shared instead of duplicated per universe
    (half the compile surface and half the edge-table scans per year)."""
    ladder = F.array(*[F.lit(p) for p in sorted(percents)])
    minp_v = ranked.select(
        "id", "rank_type", _minp_expr("rank", "n_total", percents).alias("minp")
    )

    cand_edges = edges_y.join(
        minp_v.select(
            F.col("id").alias("src"), "rank_type", F.col("minp").alias("minp_src")
        ),
        "src",
    ).join(
        minp_v.select(
            F.col("id").alias("dst"), "rank_type", F.col("minp").alias("minp_dst")
        ),
        ["dst", "rank_type"],
    )
    e_slices = cand_edges.select(
        "rank_type",
        "dst",
        F.explode(
            F.filter(
                ladder, lambda p: p >= F.greatest("minp_src", "minp_dst")
            )
        ).alias("percent"),
    )
    deg = e_slices.groupBy("rank_type", "percent", F.col("dst").alias("id")).agg(
        F.count("*").alias("d")
    )
    v_slices = minp_v.select(
        "id",
        "rank_type",
        F.explode(F.filter(ladder, lambda p: p >= F.col("minp"))).alias("percent"),
    )
    ind = v_slices.join(deg, ["rank_type", "percent", "id"], "left").select(
        "rank_type", "percent", F.coalesce("d", F.lit(0)).alias("d")
    )
    hist = ind.groupBy("rank_type", "percent", "d").agg(F.count("*").alias("c"))
    dd = hist.groupBy("rank_type", "percent").agg(
        (
            F.log2(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("dd_h_in"),
        F.sum("c").alias("n_vertices"),
    )
    se = (
        ind.filter(F.col("d") > 0)
        .select("rank_type", "percent", F.col("d").cast("double").alias("d"))
        .groupBy("rank_type", "percent")
        .agg(
            (
                F.log2(F.sum("d")) - F.sum(F.col("d") * F.log2("d")) / F.sum("d")
            ).alias("se_h_in"),
            F.count("*").alias("n_in"),
        )
    )
    ne = e_slices.groupBy("rank_type", "percent").agg(
        F.count("*").alias("n_edges")
    )
    return (
        dd.join(se, ["rank_type", "percent"], "left")
        .join(ne, ["rank_type", "percent"], "left")
        .select(
            F.lit(year).alias("year"),
            "percent",
            "rank_type",
            "n_vertices",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round("dd_h_in", 6).alias("dd_h_in"),
            F.round("se_h_in", 6).alias("se_h_in"),
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
        )
    )


def yearly_entropy_pipeline(
    vertices: DataFrame,
    edges: DataFrame,
    years: list[int],
    percents: tuple[int, ...] = (10, 20, 40, 60, 80, 100),
    min_in_degree: int = 2,
) -> DataFrame:
    """(year, percent, rank_type, n_vertices, n_edges, dd_h_in, se_h_in, n_in)
    for every (year desc, ladder point, universe in {total, current}).

    ``vertices``: (id, year); ``edges``: (src, dst).
    """
    total_indeg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("cnt_total")
    )

    out: list[DataFrame] = []
    edges_y = edges
    prev_caches: list[DataFrame] = []
    for year in sorted(years, reverse=True):
        kept_v = vertices.filter(F.col("year") <= year).select("id")
        # incremental shrink: this year's edges derive from last year's
        edges_y = (
            edges_y.join(kept_v.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(kept_v.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .cache()
        )
        cur_indeg = edges_y.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("cnt_cur")
        )
        candidates = cur_indeg.filter(F.col("cnt_cur") >= min_in_degree)
        # vertex-grain ⋈ vertex-grain: leave the strategy to AQE (both sides
        # can be huge at scale; no broadcast hint)
        ranked_base = (
            candidates.join(total_indeg, "id", "left")
            .select(
                "id",
                "cnt_cur",
                F.coalesce("cnt_total", F.lit(0)).alias("cnt_total"),
            )
            .cache()
        )
        n_cand = ranked_base.count()
        # the two universes rank differently (two range-partitioned sorts —
        # unavoidable) but everything downstream is shared: union them under
        # a rank_type key and run ONE stats subtree per year.  Cache: the
        # stats probe the ranking three times (src tag, dst tag, vertex
        # slices) — without it the row-number machinery re-executes per
        # probe; retired right after the stats materialize below.
        ranked_both = None
        for rank_type, cnt_col in (("total", "cnt_total"), ("current", "cnt_cur")):
            r = global_row_number(
                ranked_base.select("id", cnt_col),
                [F.desc(cnt_col), F.asc("id")],
                "rank",
                num_partitions=rank_partitions_for(
                    ranked_base.sparkSession, n_cand
                ),
            ).select(
                "id",
                F.lit(rank_type).alias("rank_type"),
                "rank",
                F.lit(n_cand).alias("n_total"),
            )
            ranked_both = r if ranked_both is None else ranked_both.unionByName(r)
        ranked_both = ranked_both.cache()
        # localCheckpoint materializes this year's (tiny, one row per ladder
        # point and universe) stats NOW, severing lineage to the year caches
        # — so superseded caches can be dropped and memory stays flat over
        # an 85-year walk instead of accumulating 85 live edge tables
        out.append(
            _universe_stats(edges_y, ranked_both, year, percents)
            .localCheckpoint()
        )
        ranked_both.unpersist()
        for c in prev_caches:
            c.unpersist()
        prev_caches = [edges_y, ranked_base]

    for c in prev_caches:
        c.unpersist()
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def expected_slice_sizes(n_candidates: int, percents: tuple[int, ...]) -> dict:
    """ceil(N*p/100) per ladder point (wikiEntropy.go:306-308) — exposed for
    tests."""
    return {p: math.ceil(n_candidates * p / 100) for p in percents}
