"""Driver-facing query registry: (spark, sf_dir) -> DataFrame + DuckDB oracles.

Every operator from SURVEY.md §2 that is SQL-expressible gets BOTH a Spark
query and an equivalent ANSI-SQL oracle over the same parquet tables.  Float
outputs are rounded to 6 decimals on BOTH sides so the driver's
order-insensitive value hash is stable across engines (float association
differences are ~1e-12 at these scales).

The shared derived link graph (see operators/graph.py) is defined by the SQL
CTE prefix ``GRAPH_CTES`` — the DuckDB text is the single source of truth for
the oracle side; the Spark side mirrors it in ``derive_*``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_computing_go_spark.functions.distance_complexity import distance_complexity
from graph_computing_go_spark.functions.entropy import (
    degree_distribution_entropy,
    degree_histogram,
    structural_entropy,
)
from graph_computing_go_spark.functions.multilayer import multilayer_structural_entropy
from graph_computing_go_spark.functions.ngd import google_distance
from graph_computing_go_spark.session import eager_results
from graph_computing_go_spark.operators.graph import (
    GRAPH_MOD,
    current_in_degree,
    derive_edges,
    derive_wedges,
    induce_subgraph,
    load_table,
    min_in_degree_filter,
    percent_ladder_stats,
    rank_by_in_degree,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Shared derived-graph SQL (mirrors operators/graph.py derive_*)
# --------------------------------------------------------------------------

GRAPH_CTES = f"""
raw_edges AS (
    SELECT CAST(l_orderkey % {GRAPH_MOD} AS BIGINT) AS src,
           CAST(l_partkey  % {GRAPH_MOD} AS BIGINT) AS dst
    FROM lineitem
    WHERE (l_orderkey % {GRAPH_MOD}) != (l_partkey % {GRAPH_MOD})
),
edges AS (SELECT DISTINCT src, dst FROM raw_edges),
deg AS (
    SELECT COALESCE(i.id, o.id) AS id,
           COALESCE(i.c, 0) AS in_deg,
           COALESCE(o.c, 0) AS out_deg,
           COALESCE(i.c, 0) + COALESCE(o.c, 0) AS all_deg
    FROM (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY dst) i
    FULL OUTER JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o
      ON i.id = o.id
)
"""

# --------------------------------------------------------------------------
# A1 — in-degree count
# --------------------------------------------------------------------------


@register(
    "in_degree_count",
    f"""WITH {GRAPH_CTES}
    SELECT dst AS id, COUNT(*) AS cnt FROM edges GROUP BY dst""",
)
def q_in_degree_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (wikiEntropy.go:75-83): count per dst over the resolved edge table."""
    return current_in_degree(derive_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# A2 — degree histograms (in / out / all)
# --------------------------------------------------------------------------

_HIST_SQL = """WITH {ctes}
SELECT {col} AS degree, COUNT(*) AS n_nodes FROM deg GROUP BY {col}"""


def _mk_hist(kind: str) -> QueryFn:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return degree_histogram(derive_edges(spark, sf_dir), kind)

    q.__doc__ = (
        f"A2 ({kind}-degree histogram; degreeStats.go map[int]int counters)."
    )
    return q


# Only the IN histogram stays driver-registered: the out/all variants share
# its exact plan shape (one groupBy over the deg CTE) and the quirk coverage
# lives in wiki_degree_quirk_histograms, so they were swapped out for
# decontaminate + repetition_score (VERDICT r4 next #2; registry pinned at
# 50).  They remain oracle-checked in tests/test_pruned_parity.py.
register("degree_histogram_in", _HIST_SQL.format(ctes=GRAPH_CTES, col="in_deg"))(
    _mk_hist("in")
)

DEGREE_HISTOGRAM_OUT_SQL = _HIST_SQL.format(ctes=GRAPH_CTES, col="out_deg")
DEGREE_HISTOGRAM_ALL_SQL = _HIST_SQL.format(ctes=GRAPH_CTES, col="all_deg")
q_degree_histogram_out = _mk_hist("out")
q_degree_histogram_all = _mk_hist("all")


# --------------------------------------------------------------------------
# A3 — degree-distribution entropy
# --------------------------------------------------------------------------


@register(
    "degree_distribution_entropy",
    f"""WITH {GRAPH_CTES},
    hi AS (SELECT in_deg AS d, COUNT(*) AS c FROM deg GROUP BY in_deg),
    ho AS (SELECT out_deg AS d, COUNT(*) AS c FROM deg GROUP BY out_deg),
    ha AS (SELECT all_deg AS d, COUNT(*) AS c FROM deg WHERE all_deg > 0 GROUP BY all_deg)
    SELECT
      ROUND(LOG2(CAST((SELECT SUM(c) FROM hi) AS DOUBLE))
            - (SELECT SUM(c*LOG2(CAST(c AS DOUBLE))) FROM hi)
              / CAST((SELECT SUM(c) FROM hi) AS DOUBLE), 6) AS h_in,
      ROUND(LOG2(CAST((SELECT SUM(c) FROM ho) AS DOUBLE))
            - (SELECT SUM(c*LOG2(CAST(c AS DOUBLE))) FROM ho)
              / CAST((SELECT SUM(c) FROM ho) AS DOUBLE), 6) AS h_out,
      ROUND(LOG2(CAST((SELECT SUM(c) FROM ha) AS DOUBLE))
            - (SELECT SUM(c*LOG2(CAST(c AS DOUBLE))) FROM ha)
              / CAST((SELECT SUM(c) FROM ha) AS DOUBLE), 6) AS h_all,
      CAST((SELECT SUM(c) FROM ha) AS BIGINT) AS n_nodes""",
)
def q_degree_distribution_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (DegreeEntropy(), spec lab/test.ipynb cell 1)."""
    df = degree_distribution_entropy(derive_edges(spark, sf_dir))
    return df.select(
        F.round("h_in", 6).alias("h_in"),
        F.round("h_out", 6).alias("h_out"),
        F.round("h_all", 6).alias("h_all"),
        "n_nodes",
    )


# --------------------------------------------------------------------------
# A4 — structural entropy (+ normalized)
# --------------------------------------------------------------------------

_SE_ONE = """
    SELECT SUM(d) AS s, SUM(d*LOG2(d)) AS dlogd, COUNT(*) AS n
    FROM (SELECT CAST({col} AS DOUBLE) AS d FROM deg WHERE {col} > 0)
"""


@register(
    "structural_entropy",
    f"""WITH {GRAPH_CTES},
    a_in  AS ({_SE_ONE.format(col='in_deg')}),
    a_out AS ({_SE_ONE.format(col='out_deg')}),
    a_all AS ({_SE_ONE.format(col='all_deg')})
    SELECT
      ROUND(LOG2(a_in.s) - a_in.dlogd/a_in.s, 6) AS h_in,
      ROUND(((LOG2(a_in.s) - a_in.dlogd/a_in.s) - LOG2(4.0*(a_in.n-1))/2)
            / (LOG2(CAST(a_in.n AS DOUBLE)) - LOG2(4.0*(a_in.n-1))/2), 6) AS norm_in,
      CAST(a_in.n AS BIGINT) AS n_in,
      ROUND(LOG2(a_out.s) - a_out.dlogd/a_out.s, 6) AS h_out,
      ROUND(((LOG2(a_out.s) - a_out.dlogd/a_out.s) - LOG2(4.0*(a_out.n-1))/2)
            / (LOG2(CAST(a_out.n AS DOUBLE)) - LOG2(4.0*(a_out.n-1))/2), 6) AS norm_out,
      CAST(a_out.n AS BIGINT) AS n_out,
      ROUND(LOG2(a_all.s) - a_all.dlogd/a_all.s, 6) AS h_all,
      ROUND(((LOG2(a_all.s) - a_all.dlogd/a_all.s) - LOG2(4.0*(a_all.n-1))/2)
            / (LOG2(CAST(a_all.n AS DOUBLE)) - LOG2(4.0*(a_all.n-1))/2), 6) AS norm_all,
      CAST(a_all.n AS BIGINT) AS n_all
    FROM a_in, a_out, a_all""",
)
def q_structural_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (StructEntropy(); goldens entropy_test.go:18,30-31)."""
    df = structural_entropy(derive_edges(spark, sf_dir))
    cols = []
    for sfx in ("in", "out", "all"):
        cols += [
            F.round(f"h_{sfx}", 6).alias(f"h_{sfx}"),
            F.round(f"norm_{sfx}", 6).alias(f"norm_{sfx}"),
            F.col(f"n_{sfx}"),
        ]
    return df.select(*cols)


# --------------------------------------------------------------------------
# A5 — multilayer structural entropy (single-category vertices; the
# cross-category copy path is covered by the golden unit tests)
# --------------------------------------------------------------------------


def _vertices_with_cats(edges: DataFrame) -> DataFrame:
    ids = (
        # both endpoints in one scan of the edge table
        edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
    )
    return ids.select(
        "id", F.array(F.chr(F.lit(97) + (F.col("id") % 3))).alias("cats")
    )


@register(
    "multilayer_entropy",
    f"""WITH {GRAPH_CTES},
    vc AS (SELECT id, CHR(97 + CAST(id % 3 AS INT)) AS cat
           FROM (SELECT DISTINCT src AS id FROM edges
                 UNION SELECT DISTINCT dst FROM edges)),
    tagged AS (
      SELECT e.src, e.dst, vs.cat AS cat_src, vd.cat AS cat_dst
      FROM edges e JOIN vc vs ON e.src = vs.id JOIN vc vd ON e.dst = vd.id
    ),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM tagged),
    gin AS (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS d FROM tagged GROUP BY dst),
    big AS (SELECT LOG2(SUM(d)) - SUM(d*LOG2(d))/SUM(d) AS h FROM gin),
    intra AS (SELECT * FROM tagged WHERE cat_src = cat_dst),
    mod_in AS (SELECT cat_src AS cat, dst, CAST(COUNT(*) AS DOUBLE) AS d
               FROM intra GROUP BY cat_src, dst),
    mod_h AS (SELECT cat, LOG2(SUM(d)) - SUM(d*LOG2(d))/SUM(d) AS h,
                     SUM(d) AS vol
              FROM mod_in GROUP BY cat),
    mod_g AS (SELECT cat_src AS cat, CAST(COUNT(*) AS DOUBLE) AS g
              FROM tagged WHERE cat_src != cat_dst GROUP BY cat_src)
    SELECT ROUND((SELECT h FROM big), 6) AS big,
           ROUND((SELECT SUM(mh.h * mh.vol / m.m
                          - LOG2(mh.vol / m.m) * COALESCE(mg.g, 0) / m.m)
                  FROM mod_h mh LEFT JOIN mod_g mg ON mh.cat = mg.cat, m), 6)
             AS little""",
)
def q_multilayer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (entropy.go:100-164) on the derived graph with cat = chr(97+id%3)."""
    edges = derive_edges(spark, sf_dir)
    df = multilayer_structural_entropy(_vertices_with_cats(edges), edges)
    return df.select(F.round("big", 6).alias("big"), F.round("little", 6).alias("little"))


# --------------------------------------------------------------------------
# A6/A7 — distance complexity over the weighted derived graph
# --------------------------------------------------------------------------


@register(
    "distance_complexity",
    f"""WITH {GRAPH_CTES},
    wedges AS (
      SELECT GREATEST(src, dst) AS a, LEAST(src, dst) AS b,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM raw_edges GROUP BY 1, 2
    ),
    vc AS (SELECT id, CHR(97 + CAST(id % 3 AS INT)) AS cat
           FROM (SELECT DISTINCT a AS id FROM wedges
                 UNION SELECT DISTINCT b FROM wedges)),
    incident AS (SELECT a AS id, w FROM wedges UNION ALL SELECT b, w FROM wedges),
    pn AS (SELECT id, SUM(w) AS s, LOG2(SUM(w)) - SUM(w*LOG2(w))/SUM(w) AS h
           FROM incident GROUP BY id),
    big AS (SELECT SUM(h*s)/SUM(s) AS v FROM pn),
    tagged AS (SELECT e.a, e.b, e.w, ca.cat AS cat_a, cb.cat AS cat_b
               FROM wedges e JOIN vc ca ON e.a = ca.id JOIN vc cb ON e.b = cb.id),
    vall AS (SELECT SUM(w)*2 AS v FROM tagged),
    intra AS (SELECT * FROM tagged WHERE cat_a = cat_b),
    ii AS (SELECT cat_a AS cat, a AS id, w FROM intra
           UNION ALL SELECT cat_a, b, w FROM intra),
    nh AS (SELECT cat, id, SUM(w) AS s,
                  LOG2(SUM(w)) - SUM(w*LOG2(w))/SUM(w) AS h
           FROM ii GROUP BY cat, id),
    mi AS (SELECT cat_a AS cat, SUM(w)*2 AS inner FROM intra GROUP BY cat_a),
    hm AS (SELECT nh.cat, SUM(nh.s*nh.h)/MAX(mi.inner) AS h_module,
                  MAX(mi.inner) AS inner
           FROM nh JOIN mi ON nh.cat = mi.cat GROUP BY nh.cat),
    cr AS (SELECT cat_a AS cat, w FROM tagged WHERE cat_a != cat_b
           UNION ALL SELECT cat_b, w FROM tagged WHERE cat_a != cat_b),
    oo AS (SELECT cat, SUM(w) AS outer FROM cr GROUP BY cat)
    SELECT ROUND((SELECT v FROM big), 6) AS big,
           ROUND((SELECT SUM(hm.h_module * hm.inner / vall.v
                          - LOG2(hm.inner / vall.v) * COALESCE(oo.outer, 0) / vall.v)
                  FROM hm LEFT JOIN oo ON hm.cat = oo.cat, vall), 6) AS little""",
)
def q_distance_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 (distanceComplexity.go:151-287) on weighted derived edges."""
    wedges = derive_wedges(spark, sf_dir)
    ids = wedges.select(F.explode(F.array("a", "b")).alias("id")).distinct()
    cats = ids.select(
        "id", F.array(F.chr(F.lit(97) + (F.col("id") % 3))).alias("cats")
    )
    # derive_wedges emits one (a>b) row per undirected edge by construction
    df = distance_complexity(wedges, cats, assume_canonical=True)
    return df.select(F.round("big", 6).alias("big"), F.round("little", 6).alias("little"))


# --------------------------------------------------------------------------
# A9/J6 — normalized Google distance over the top-50 in-degree core
# --------------------------------------------------------------------------


@register(
    "google_distance",
    f"""WITH {GRAPH_CTES},
    ranked AS (SELECT dst AS id, COUNT(*) AS cnt,
                      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, dst ASC) AS rn
               FROM edges GROUP BY dst),
    core AS (SELECT id FROM ranked WHERE rn <= 50),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM
          (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges)),
    ie AS (SELECT DISTINCT e.src, e.dst FROM edges e JOIN core c ON e.dst = c.id),
    indeg AS (SELECT dst, COUNT(*) AS deg FROM ie GROUP BY dst),
    pairs AS (SELECT l.dst AS a, r.dst AS b, COUNT(*) AS inter
              FROM ie l JOIN ie r ON l.src = r.src AND l.dst < r.dst
              GROUP BY l.dst, r.dst)
    SELECT p.a, p.b, p.inter, da.deg AS deg_a, db.deg AS deg_b,
           ROUND((LOG2(CAST(GREATEST(da.deg, db.deg) AS DOUBLE))
                  - LOG2(CAST(p.inter AS DOUBLE)))
                 / ((SELECT LOG2(n) FROM n)
                    - LOG2(CAST(LEAST(da.deg, db.deg) AS DOUBLE))), 6) AS distance
    FROM pairs p JOIN indeg da ON p.a = da.dst JOIN indeg db ON p.b = db.dst""",
)
def q_google_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (wikipediaGoogleDistance.go:91-136), core = top-50 by in-degree."""
    edges = derive_edges(spark, sf_dir).cache()
    ranked = rank_by_in_degree(edges)
    # ≤50 rows by construction; cache so the final NGD job reuses it instead
    # of re-deriving the whole ranking lineage inside its semi-join
    core = ranked.filter(F.col("rank") <= 50).select("id").cache()
    n = (
        # both endpoints in one scan of the edge table
        edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
        .count()
    )
    df = google_distance(edges, core, n, core_count=50)
    return df.select(
        "a", "b", "inter", F.col("deg_a").cast("long").alias("deg_a"),
        F.col("deg_b").cast("long").alias("deg_b"),
        F.round("distance", 6).alias("distance"),
    )


# --------------------------------------------------------------------------
# A10 — top-percent ladder slices
# --------------------------------------------------------------------------


@register(
    "top_percent_slice",
    f"""WITH {GRAPH_CTES},
    ranked AS (SELECT dst AS id, COUNT(*) AS cnt,
                      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, dst ASC) AS rn,
                      COUNT(*) OVER () AS n_total
               FROM edges GROUP BY dst),
    percents(percent) AS (VALUES (10), (20), (40), (60), (80), (100)),
    sel AS (SELECT p.percent, r.id FROM percents p, ranked r
            WHERE r.rn <= CEIL(r.n_total * p.percent / 100)),
    nv AS (SELECT percent, COUNT(*) AS n_vertices FROM sel GROUP BY percent),
    ne AS (SELECT s1.percent, COUNT(*) AS n_edges
           FROM edges e
           JOIN sel s1 ON e.src = s1.id
           JOIN sel s2 ON e.dst = s2.id AND s1.percent = s2.percent
           GROUP BY s1.percent)
    SELECT nv.percent, nv.n_vertices, COALESCE(ne.n_edges, 0) AS n_edges
    FROM nv LEFT JOIN ne ON nv.percent = ne.percent""",
)
def q_top_percent_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (wikiEntropy.go:281-310): one ranking, six ladder filters."""
    return percent_ladder_stats(derive_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# P6/J4 — min-in-degree filter + subgraph induction
# --------------------------------------------------------------------------


@register(
    "subgraph_induction",
    f"""WITH {GRAPH_CTES},
    keep AS (SELECT dst AS id FROM edges GROUP BY dst HAVING COUNT(*) >= 100),
    induced AS (SELECT e.src, e.dst FROM edges e
                WHERE e.src IN (SELECT id FROM keep)
                  AND e.dst IN (SELECT id FROM keep)),
    skeep AS (SELECT DISTINCT dst AS id FROM edges WHERE dst % 2 = 0),
    shrunk AS (SELECT e.src, e.dst FROM edges e
               WHERE e.dst IN (SELECT id FROM skeep))
    SELECT 'induced' AS stage, src AS a, dst AS b FROM induced
    UNION ALL
    SELECT 'shrink_indeg', dst, COUNT(*) FROM shrunk GROUP BY dst""",
)
def q_subgraph_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+P6+J5 family in one stage-labeled row set:
    stage='induced' → the (src, dst) edges induced on the
    min-in-degree>=100 vertex set (openAlexEntropy.go:314-339,365-374);
    stage='shrink_indeg' → (id, current in-degree) after a graph shrink that
    drops edges whose dst left the vertex set (here: odd ids;
    openAlexEntropy.go:341-363)."""
    from graph_computing_go_spark.operators.graph import shrink

    edges = derive_edges(spark, sf_dir)
    keep = min_in_degree_filter(edges, 100)
    induced = induce_subgraph(edges, keep).select(
        F.lit("induced").alias("stage"),
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
    )
    skeep = (
        edges.select(F.col("dst").alias("id")).distinct().filter(F.col("id") % 2 == 0)
    )
    shrunk = current_in_degree(shrink(edges, skeep)).select(
        F.lit("shrink_indeg").alias("stage"),
        F.col("id").alias("a"),
        F.col("cnt").alias("b"),
    )
    return induced.unionByName(shrunk)


# --------------------------------------------------------------------------
# J2 — dedup with preference (best customer per nation)
# --------------------------------------------------------------------------


@register(
    "dedup_preference",
    """SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 6) AS c_acctbal
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) WHERE rn = 1""",
)
def q_dedup_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (wikiEntropy.go:163-184): keep-best-per-key window dedup."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 6).alias("c_acctbal"))
    )


# --------------------------------------------------------------------------
# J3 — bounded redirect-chain resolution (3 hops)
# --------------------------------------------------------------------------

_REDIR_PAGES = """
    pages AS (SELECT CAST(p_partkey AS BIGINT) AS id,
                     CASE WHEN p_partkey % 8 = 0 THEN NULL
                          ELSE CAST(p_partkey - 1 AS BIGINT) END AS redirect
              FROM part)
"""


@register(
    "redirect_resolution",
    f"""WITH {_REDIR_PAGES}
    SELECT p0.id,
      CASE
        WHEN p0.redirect IS NULL THEN p0.id
        WHEN p1.id IS NULL THEN NULL
        WHEN p1.redirect IS NULL THEN p1.id
        WHEN p2.id IS NULL THEN NULL
        WHEN p2.redirect IS NULL THEN p2.id
        WHEN p3.id IS NULL THEN NULL
        WHEN p3.redirect IS NULL THEN p3.id
        ELSE NULL
      END AS resolved_id
    FROM pages p0
    LEFT JOIN pages p1 ON p0.redirect = p1.id
    LEFT JOIN pages p2 ON p1.redirect = p2.id
    LEFT JOIN pages p3 ON p2.redirect = p3.id""",
)
def q_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (wikiEntropy.go:188-230): <=3-hop pointer chase, unresolved -> NULL.

    Synthetic redirect table over part: id%8==0 pages are canonical, others
    redirect to id-1 (chain length id%8; >3 stays unresolved, matching the
    reference's bounded ``for i < 3`` loop)."""
    part = load_table(spark, sf_dir, "part")
    pages = part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.when(F.col("p_partkey") % 8 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("p_partkey") - 1).cast("long"))
        .alias("redirect"),
    )
    p0, p1, p2, p3 = [
        pages.select(
            F.col("id").alias(f"id{i}"), F.col("redirect").alias(f"r{i}")
        )
        for i in range(4)
    ]
    j = (
        p0.join(p1, p0["r0"] == p1["id1"], "left")
        .join(p2, p1["r1"] == p2["id2"], "left")
        .join(p3, p2["r2"] == p3["id3"], "left")
    )
    resolved = (
        F.when(F.col("r0").isNull(), F.col("id0"))
        .when(F.col("id1").isNull(), F.lit(None))
        .when(F.col("r1").isNull(), F.col("id1"))
        .when(F.col("id2").isNull(), F.lit(None))
        .when(F.col("r2").isNull(), F.col("id2"))
        .when(F.col("id3").isNull(), F.lit(None))
        .when(F.col("r3").isNull(), F.col("id3"))
        .otherwise(F.lit(None))
    )
    return j.select(F.col("id0").alias("id"), resolved.cast("long").alias("resolved_id"))


# --------------------------------------------------------------------------
# Classic scan→filter→agg anchor (TPC-H Q1 shape) + time-window agg
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→hash-agg anchor (S3+P4+A-family shape, TPC-H Q1 style)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            # price sums reach 1e9+ at sf>=0.1: 2-decimal rounding keeps the
            # check meaningful while tolerating ULP-level association error
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "events_hourly",
    """SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
    FROM events GROUP BY 1, 2""",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events table (batch twin of the
    streaming path in streaming/events.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# North-rule iterative algorithms (SURVEY.md §2.10).  Fixed-iteration
# variants get UNROLLED SQL oracles (DuckDB's recursive CTEs mis-evaluate
# aggregates inside the recursive term — verified: a 1-step recursive
# PageRank inflates total mass to 1.34 while the identical direct query
# matches Spark to 1e-15); convergence-based variants are golden-tested
# against pure-Python oracles in tests/test_plans.py.  Only the transitive
# closure for connected components uses recursion (no aggregate inside).
# --------------------------------------------------------------------------

_PR_ITERS = 10
_LP_ITERS = 4


def _pagerank_oracle(iters: int) -> str:
    steps = ["r0 AS (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v)"]
    for k in range(1, iters + 1):
        steps.append(
            f"""g{k} AS (SELECT l.dst AS id, SUM(r{k-1}.rank / l.od) AS contrib
        FROM r{k-1} JOIN links_aug l ON r{k-1}.id = l.src GROUP BY l.dst),
    r{k} AS (SELECT id, 0.15/(SELECT n FROM nn) + 0.85*COALESCE(contrib, 0) AS rank
        FROM g{k})"""
        )
    body = ",\n    ".join(steps)
    return f"""WITH {GRAPH_CTES},
    v AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
    links AS (SELECT src, dst,
                     CAST(COUNT(*) OVER (PARTITION BY src) AS DOUBLE) AS od
              FROM edges),
    links_aug AS (SELECT src, dst, od FROM links
                  UNION ALL SELECT id, id, NULL FROM v),
    {body}
    SELECT id, ROUND(rank, 6) AS rank FROM r{iters}"""


@register("pagerank_fixed", _pagerank_oracle(_PR_ITERS))
def q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_computing_go_spark.plans import pagerank

    ranks, _ = pagerank(
        derive_edges(spark, sf_dir), tol=0.0, max_iter=_PR_ITERS, dangling="drop"
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


@register(
    "connected_components",
    f"""WITH RECURSIVE {GRAPH_CTES},
    ud AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    v AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
    reach AS (
      SELECT id, id AS r FROM v
      UNION
      SELECT reach.id, e.dst AS r FROM reach JOIN ud e ON reach.r = e.src
    )
    SELECT id, MIN(r) AS component FROM reach GROUP BY id""",
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (min-label propagation); oracle computes the same
    fixpoint via transitive closure."""
    from graph_computing_go_spark.plans import connected_components

    comps, _ = connected_components(derive_edges(spark, sf_dir))
    return comps


def _lp_oracle(iters: int) -> str:
    steps = ["l0 AS (SELECT id, id AS label FROM v)"]
    for k in range(1, iters + 1):
        steps.append(
            f"""f{k} AS (SELECT e.dst AS id, l{k-1}.label AS label, COUNT(*) AS c
        FROM l{k-1} JOIN ud e ON l{k-1}.id = e.src GROUP BY e.dst, l{k-1}.label),
    b{k} AS (SELECT id, label FROM f{k}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                                   ORDER BY c DESC, label ASC) = 1),
    l{k} AS (SELECT l{k-1}.id, COALESCE(b{k}.label, l{k-1}.label) AS label
        FROM l{k-1} LEFT JOIN b{k} ON l{k-1}.id = b{k}.id)"""
        )
    body = ",\n    ".join(steps)
    return f"""WITH {GRAPH_CTES},
    ud AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    v AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
    {body}
    SELECT id, label FROM l{iters}"""


@register("label_propagation_fixed", _lp_oracle(_LP_ITERS))
def q_label_propagation_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_computing_go_spark.plans import label_propagation

    labels, _ = label_propagation(
        derive_edges(spark, sf_dir), exact_iters=_LP_ITERS
    )
    return labels


q_pagerank_fixed.__doc__ = (
    f"PageRank, {_PR_ITERS} power iterations, dangling mass dropped (the "
    "derived graph has no dangling vertices at sf>=0.001 so "
    "drop==redistribute there; the redistribute path is golden-tested in "
    "tests/test_plans.py)."
)
q_label_propagation_fixed.__doc__ = (
    f"Synchronous label propagation, {_LP_ITERS} supersteps, ties -> min."
)


@register(
    "triangle_count",
    f"""WITH {GRAPH_CTES},
    canon AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM edges),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM canon e1 JOIN canon e2 ON e1.b = e2.a
            WHERE EXISTS (SELECT 1 FROM canon e3
                          WHERE e3.a = e1.a AND e3.b = e2.b))
    SELECT COUNT(*) AS n_triangles FROM tri""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count (canonical-orientation wedge join)."""
    from graph_computing_go_spark.plans import triangle_count

    return triangle_count(derive_edges(spark, sf_dir))


@register(
    "triangles_per_vertex",
    f"""WITH {GRAPH_CTES},
    canon AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM edges),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM canon e1 JOIN canon e2 ON e1.b = e2.a
            WHERE EXISTS (SELECT 1 FROM canon e3
                          WHERE e3.a = e1.a AND e3.b = e2.b)),
    corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
    SELECT id, COUNT(*) AS n_triangles FROM corners GROUP BY id""",
)
def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle participation counts."""
    from graph_computing_go_spark.plans import triangles_per_vertex

    return triangles_per_vertex(derive_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# Training-data toolkit: text analysis (operators/text.py)
# --------------------------------------------------------------------------

_DOC_WORDS_SQL = """
    words0 AS (SELECT doc_id AS id,
                      unnest(range(1, len(arr) + 1)) AS pos,
                      unnest(arr) AS w0
               FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
                     FROM documents) t),
    words AS (SELECT id, pos, LOWER(w0) AS word FROM words0)
"""


@register(
    "token_count",
    """SELECT doc_id, CAST(LEN(string_split_regex(TRIM(text), '\\s+')) AS INT)
              AS n_tokens
    FROM documents""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting over documents."""
    from graph_computing_go_spark.operators.text import token_count

    return token_count(load_table(spark, sf_dir, "documents"))


def _stopword_values() -> str:
    from graph_computing_go_spark.operators.text import STOPWORDS

    rows = [
        f"('{lang}', '{w}')"
        for lang, ws in sorted(STOPWORDS.items())
        for w in ws
    ]
    return ", ".join(rows)


@register(
    "language_id",
    f"""WITH sw(cand_lang, word) AS (VALUES {_stopword_values()}),
    {_DOC_WORDS_SQL},
    n_tok AS (SELECT id, COUNT(*) AS n_tokens FROM words GROUP BY id),
    hits AS (SELECT w.id, sw.cand_lang, COUNT(*) AS hits
             FROM words w JOIN sw ON w.word = sw.word
             GROUP BY w.id, sw.cand_lang),
    best AS (SELECT id, cand_lang AS pred_lang, hits FROM hits
             QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY hits DESC, cand_lang ASC) = 1)
    SELECT n_tok.id AS doc_id,
           COALESCE(best.pred_lang, 'und') AS pred_lang,
           ROUND(COALESCE(best.hits, 0) / CAST(n_tok.n_tokens AS DOUBLE), 6)
             AS hit_ratio
    FROM n_tok LEFT JOIN best ON n_tok.id = best.id""",
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language identification."""
    from graph_computing_go_spark.operators.text import language_id

    return language_id(load_table(spark, sf_dir, "documents"))


@register(
    "quality_score",
    """WITH base AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(TRIM(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(LENGTH(text) AS DOUBLE) AS n_chars,
             CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               AS alpha_chars
      FROM documents)
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           ROUND((n_chars - (n_tokens - 1)) / n_tokens, 6) AS avg_word_len,
           ROUND(alpha_chars / n_chars, 6) AS alpha_ratio,
           ROUND(0.4 * LEAST(GREATEST(n_tokens/100.0, 0.0), 1.0)
                 + 0.3 * LEAST(GREATEST(((n_chars-(n_tokens-1))/n_tokens - 2)/5.0,
                                        0.0), 1.0)
                 + 0.3 * (alpha_chars / n_chars), 6) AS score
    FROM base""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document quality scoring."""
    from graph_computing_go_spark.operators.text import quality_score

    return quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "fingerprint",
    """SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             string_split(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'), ''),
             c -> CAST(ORD(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 2147483647) AS fp
    FROM documents""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint."""
    from graph_computing_go_spark.operators.text import fingerprint

    return fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "repetition_score",
    """WITH base AS (
      SELECT doc_id, replace(text, ' row ', chr(10)) AS text FROM documents),
    feat AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                                        x -> trim(x)),
                         x -> x != '') AS lines,
             string_split_regex(trim(text), '\\s+') AS t
      FROM base)
    SELECT doc_id,
           CASE WHEN len(lines) > 0 THEN
             ROUND(1 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE), 6)
           END AS dup_line_frac,
           CASE WHEN len(t) - 1 > 0 THEN
             ROUND(1 - len(list_distinct(list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i+1])))
                   / CAST(len(t) - 1 AS DOUBLE), 6)
           END AS dup_2gram_frac,
           CASE WHEN len(t) - 2 > 0 THEN
             ROUND(1 - len(list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                   / CAST(len(t) - 2 AS DOUBLE), 6)
           END AS dup_3gram_frac
    FROM feat""",
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition signals (dup_line/2gram/3gram fractions) —
    row-local, zero exchanges.  The documents table is single-line, so the
    query injects line structure deterministically on BOTH sides (every
    ' row ' occurrence becomes a newline) to make dup_line_frac a real
    signal rather than a constant 0."""
    from graph_computing_go_spark.operators.text import repetition_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace("text", " row ", "\n").alias("text")
    )
    return repetition_score(docs)


@register(
    "decontaminate",
    """WITH toks AS (
      SELECT doc_id AS id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS t
      FROM documents),
    grams AS (
      SELECT id,
             unnest(list_transform(range(1, len(t) - 6),
                    i -> array_to_string(list_slice(t, i, i + 7), ' ')))
               AS shingle
      FROM toks WHERE len(t) >= 8),
    ev AS (SELECT DISTINCT shingle FROM grams WHERE id % 25 = 0),
    hits AS (SELECT g.id, COUNT(*) AS n_hits
             FROM grams g JOIN ev ON g.shingle = ev.shingle
             GROUP BY g.id)
    SELECT d.doc_id AS id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.id""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination ledger: every corpus doc exactly once with
    its 8-word-gram hit count against a planted eval set (every 25th doc) —
    eval membership and any genuine cross-doc 8-gram overlap both flag.
    broadcast_eval=True takes the broadcast fast-path (the eval set is tiny
    by construction; the AQE-decided default is the scale path, bench/pytest
    gated)."""
    from graph_computing_go_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs, docs.filter(F.col("doc_id") % 25 == 0), k=8, broadcast_eval=True
    )


# --------------------------------------------------------------------------
# Training-data toolkit: dedup family (operators/dedup.py)
# --------------------------------------------------------------------------

_SHINGLES_SQL = f"""
    {_DOC_WORDS_SQL},
    sh0 AS (SELECT id,
                   word || ' ' || LEAD(word, 1) OVER w || ' '
                        || LEAD(word, 2) OVER w AS shingle,
                   LEAD(word, 2) OVER w AS last_w
            FROM words
            WINDOW w AS (PARTITION BY id ORDER BY pos)),
    sh AS (SELECT DISTINCT id, shingle FROM sh0 WHERE last_w IS NOT NULL)
"""


@register(
    "exact_dedup",
    """SELECT sha256(text) AS hash, MIN(doc_id) AS keep_id,
              COUNT(*) AS n_dupes
    FROM documents GROUP BY sha256(text)""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via sha2 grouping, smallest id wins."""
    from graph_computing_go_spark.operators.dedup import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "minhash_lsh",
    f"""WITH {_SHINGLES_SQL},
    seeded AS (SELECT sh.id, g.s AS seed, sh.shingle
               FROM sh, generate_series(0, 15) g(s)),
    sig AS (SELECT id, seed,
                   MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS minhash
            FROM seeded GROUP BY id, seed),
    bands AS (SELECT id, seed // 4 AS band,
                     md5(string_agg(minhash, ',' ORDER BY minhash)) AS band_key
              FROM sig GROUP BY id, seed // 4)
    SELECT l.id AS a, r.id AS b, COUNT(*) AS n_bands
    FROM bands l JOIN bands r ON l.band = r.band AND l.band_key = r.band_key
    WHERE l.id < r.id GROUP BY l.id, r.id""",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) candidate near-dup pairs."""
    from graph_computing_go_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(load_table(spark, sf_dir, "documents"))


@register(
    "ngram_jaccard",
    f"""WITH {_SHINGLES_SQL},
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (SELECT l.id AS a, r.id AS b, COUNT(*) AS inter
              FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.id < r.id
              GROUP BY l.id, r.id),
    scored AS (SELECT i.a, i.b, i.inter, sa.n AS n_a, sb.n AS n_b,
                      ROUND(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6)
                        AS jaccard
               FROM inter i
               JOIN sizes sa ON i.a = sa.id JOIN sizes sb ON i.b = sb.id)
    SELECT * FROM scored WHERE jaccard >= 0.2""",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs with similarity >= 0.2."""
    from graph_computing_go_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), min_jaccard=0.2
    )


_SIMHASH_CTES = """words AS (
      SELECT id, md5(LOWER(w)) AS h FROM (
        SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents)),
    wb AS (SELECT id, h, g.j AS j FROM words, generate_series(0, 31) g(j)),
    bits AS (SELECT id, j,
                    (CAST(FLOOR((STRPOS('0123456789abcdef',
                                        SUBSTR(h, j // 4 + 1, 1)) - 1)
                                / POWER(2, 3 - j % 4)) AS BIGINT) % 2) * 2 - 1
                      AS vote
             FROM wb),
    bitsum AS (SELECT id, j, SUM(vote) AS s FROM bits GROUP BY id, j),
    sig AS (SELECT id,
                   CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, j) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bitsum GROUP BY id)"""

# Oracle for the unregistered simhash_near_dup parity check
# (tests/test_pruned_parity.py — the registry is pinned at 50).  All-pairs
# hamming <= 3 is EXACTLY the operator's output: the segment pigeonhole
# (max_hamming < n_segments) guarantees full recall, so the oracle verifies
# both the hamming math and the zero-recall-loss claim of the bucketing.
SIMHASH_NEAR_DUP_SQL = f"""WITH {_SIMHASH_CTES}
    SELECT l.id AS a, r.id AS b,
           CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming,
           LEAST(l.id, r.id) AS keep_id
    FROM sig l JOIN sig r ON l.id < r.id
    WHERE bit_count(xor(l.simhash, r.simhash)) <= 3"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3, 4 segments) on documents —
    unregistered (driver registry pinned at 50); oracled in
    tests/test_pruned_parity.py."""
    from graph_computing_go_spark.operators.dedup import simhash_near_dup

    return simhash_near_dup(
        load_table(spark, sf_dir, "documents"), max_hamming=3, n_segments=4
    ).withColumn("hamming", F.col("hamming").cast("long"))


@register(
    "simhash",
    f"WITH {_SIMHASH_CTES}\n    SELECT id AS doc_id, simhash FROM sig",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures per document."""
    from graph_computing_go_spark.operators.dedup import simhash

    return simhash(load_table(spark, sf_dir, "documents")).withColumnRenamed(
        "id", "doc_id"
    )


# --------------------------------------------------------------------------
# Training-data toolkit: similarity search (operators/similarity.py)
# --------------------------------------------------------------------------

_EMB_NORMS_SQL = """
    comp AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
                    CAST(unnest(embedding) AS DOUBLE) AS x
             FROM embeddings),
    norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM comp GROUP BY vec_id)
"""


@register(
    "cosine_topk",
    f"""WITH {_EMB_NORMS_SQL},
    q AS (SELECT vec_id FROM embeddings WHERE vec_id < 5),
    dots AS (SELECT c.vec_id AS c_id, qc.vec_id AS q_id,
                    SUM(c.x * qc.x) AS dot
             FROM comp c JOIN comp qc
               ON c.i = qc.i AND qc.vec_id IN (SELECT vec_id FROM q)
             WHERE c.vec_id != qc.vec_id
             GROUP BY c.vec_id, qc.vec_id),
    scored AS (SELECT d.q_id, d.c_id,
                      ROUND(d.dot / (nc.nrm * nq.nrm), 6) AS cosine
               FROM dots d
               JOIN norms nc ON d.c_id = nc.vec_id
               JOIN norms nq ON d.q_id = nq.vec_id)
    SELECT q_id, c_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id ASC) AS INT)
             AS rank
    FROM scored
    QUALIFY rank <= 5""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 5, executed via the
    Arrow/numpy scale path (mapInPandas matmul).  The brute-force DataFrame
    formulation (``similarity.cosine_topk``) shares this oracle's contract
    and is pinned equal to the Arrow path by
    tests/test_toolkit.py::test_cosine_topk_arrow_equals_dataframe — one
    driver row verifies both."""
    from graph_computing_go_spark.operators.similarity import cosine_topk_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_arrow(emb, emb.filter(F.col("vec_id") < 5), k=5)


@register(
    "lsh_ann_topk",
    f"""WITH {_EMB_NORMS_SQL},
    planes AS (SELECT c.vec_id, g.p AS p,
                      SUM(c.x * (((1103515245 * (g.p * 64 + (c.i - 1)) + 12345)
                                  % 2147483648) / 2147483648.0 - 0.5)) AS dot
               FROM comp c, generate_series(0, 7) g(p)
               GROUP BY c.vec_id, g.p),
    sig AS (SELECT vec_id,
                   CAST(SUM(CASE WHEN dot > 0 THEN CAST(POWER(2, p) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM planes GROUP BY vec_id),
    q AS (SELECT vec_id FROM embeddings WHERE vec_id < 5),
    dots AS (SELECT c.vec_id AS c_id, qc.vec_id AS q_id, SUM(c.x * qc.x) AS dot
             FROM comp c JOIN comp qc
               ON c.i = qc.i AND qc.vec_id IN (SELECT vec_id FROM q)
             WHERE c.vec_id != qc.vec_id
             GROUP BY c.vec_id, qc.vec_id),
    scored AS (SELECT d.q_id, d.c_id,
                      ROUND(d.dot / (nc.nrm * nq.nrm), 6) AS cosine
               FROM dots d
               JOIN sig sc ON d.c_id = sc.vec_id
               JOIN sig sq ON d.q_id = sq.vec_id AND sc.bucket = sq.bucket
               JOIN norms nc ON d.c_id = nc.vec_id
               JOIN norms nq ON d.q_id = nq.vec_id)
    SELECT q_id, c_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id ASC) AS INT)
             AS rank
    FROM scored
    QUALIFY rank <= 5""",
)
def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (8 hyperplanes, exact re-rank)."""
    from graph_computing_go_spark.operators.similarity import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=8)


# --------------------------------------------------------------------------
# Code-repos ingest + multimodal kernels — every one oracle-checked.  The
# synthetic repos table is deterministic (seeded, no wall clock), so the
# oracle EMBEDS the same 300 rows as a VALUES CTE and re-derives extraction
# (regexp_extract_all) and two-key resolution in pure DuckDB SQL; the
# multimodal byte statistics re-derive from hex(encode(text)).
# --------------------------------------------------------------------------


def _repos_values_sql(n_files: int = 300, seed: int = 42) -> str:
    """The synthesize_repos rows as a DuckDB VALUES CTE body (repo, path,
    lang, content) — byte-identical to the Spark-side table."""
    from graph_computing_go_spark.sources.repos import _gen_rows

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = [
        f"({q(repo)}, {q(path)}, {q(lang)}, {q(content)})"
        for repo, path, _commit, lang, content in _gen_rows(n_files, seed)
    ]
    return ",\n".join(rows)


# extraction + resolution mirrored from sources/ingest.py (_PATTERNS,
# _ref_to_target, resolve_imports) — same regexes, same min()-winner maps
_CODE_EDGES_SQL = f"""
    repos(repo, path, lang, content) AS (VALUES {_repos_values_sql()}),
    refs AS (
      SELECT repo, path, unnest(
        CASE lang
          WHEN 'python' THEN regexp_extract_all(content, '(?m)^import\\s+(\\S+:\\S+)$', 1)
          WHEN 'go'     THEN regexp_extract_all(content, '(?m)^import "([^"]+)"$', 1)
          ELSE               regexp_extract_all(content, 'require\\(''([^'']+)''\\)', 1)
        END) AS ref
      FROM repos),
    targets AS (
      SELECT repo, path, ref,
        CASE WHEN contains(ref, ':') THEN string_split(ref, ':')[1]
             ELSE string_split(ref, '/')[1] || '/' || string_split(ref, '/')[2]
        END AS tgt_repo,
        replace(CASE WHEN contains(ref, ':') THEN string_split(ref, ':')[2]
                     ELSE regexp_replace(ref, '^[^/]+/[^/]+/', '')
                END, '.', '/') AS tgt_stem
      FROM refs),
    file_dim AS (
      SELECT repo AS tgt_repo, path AS dst_path,
             regexp_replace(path, '\\.[a-z]+$', '') AS stem
      FROM repos),
    exact AS (SELECT tgt_repo, stem AS tgt_stem, MIN(dst_path) AS dst_exact
              FROM file_dim GROUP BY 1, 2),
    norm AS (SELECT tgt_repo, LOWER(stem) AS norm_stem, MIN(dst_path) AS dst_norm
             FROM file_dim GROUP BY 1, 2),
    code_edges AS (
      SELECT * FROM (
        SELECT t.repo AS src_repo, t.path AS src_path,
               t.tgt_repo AS dst_repo,
               COALESCE(e.dst_exact, n.dst_norm) AS dst_path
        FROM targets t
        LEFT JOIN exact e ON t.tgt_repo = e.tgt_repo AND t.tgt_stem = e.tgt_stem
        LEFT JOIN norm n ON t.tgt_repo = n.tgt_repo
                        AND LOWER(t.tgt_stem) = n.norm_stem)
      WHERE dst_path IS NOT NULL
        AND NOT (src_repo = dst_repo AND src_path = dst_path))
"""


def _proc_start(pid: int) -> str | None:
    """starttime of a live pid (/proc/<pid>/stat field 22, stable for the
    process's lifetime), or None where /proc is unavailable."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            # comm (field 2) may contain spaces/parens — split after ')'
            return fh.read().rsplit(")", 1)[1].split()[19]
    except (OSError, IndexError):
        return None


def _owner_alive(d: str) -> bool | None:
    """True: the recorded owner is verifiably alive.  False: gone, or its
    PID was recycled (starttime mismatch).  None: no/odd marker or
    unverifiable — the caller applies the mtime fallback."""
    import os

    try:
        parts = open(os.path.join(d, ".owner_pid")).read().split()
        pid = int(parts[0])
    except (OSError, ValueError, IndexError):
        return None
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass  # exists, owned by someone else — fall through to starttime
    if len(parts) < 2:
        return None  # pid-only marker: liveness can't rule out recycling
    now_start = _proc_start(pid)
    if now_start is None:
        return None  # no /proc — can't distinguish owner from recycler
    return now_start == parts[1]


def _prune_roundtrip_dirs(td: str, keep: str) -> None:
    """Reclaim sibling round-trip dirs keyed on LIVENESS, not age: each dir
    carries its owner's "pid starttime" marker.  A recycled PID — any
    long-lived process inheriting the number after the owner exits — is
    detected by the starttime mismatch, so a VERIFIABLY alive owner is never
    reclaimed (a long-running concurrent driver can't lose its live dir
    mid-write).  Markerless dirs (older layout / torn write) and markers
    whose liveness can't be verified fall back to mtime > 24h."""
    import glob
    import os
    import shutil
    import time

    for old in glob.glob(f"{td}/code_repos_roundtrip_*"):
        if old == keep:
            continue
        alive = _owner_alive(old)
        try:
            stale = time.time() - os.path.getmtime(old) > 24 * 3600
        except OSError:
            continue  # raced with a concurrent reclaim
        if (alive is False) or (alive is None and stale):
            shutil.rmtree(old, ignore_errors=True)


def _write_owner_marker(rt: str) -> None:
    import os

    try:
        start = _proc_start(os.getpid())
        with open(os.path.join(rt, ".owner_pid"), "w") as fh:
            fh.write(f"{os.getpid()} {start}" if start else str(os.getpid()))
    except OSError:
        pass  # marker is best-effort; mtime fallback still applies


@register(
    "code_edge_table",
    f"""WITH {_CODE_EDGES_SQL}
    SELECT src_repo, src_path, dst_repo, dst_path FROM code_edges""",
)
def q_code_edge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.json north-star input path: synthetic (repo, path, commit,
    lang, content) table → sha256-checked ingest → vectorized import
    extraction → two-stage resolution → edge table.

    The driver-facing projection is the (repo, path) provenance pairs — a
    bijection of the xxhash64 vertex ids (which DuckDB cannot recompute;
    id determinism is pytest-covered in tests/test_ingest.py)."""
    from graph_computing_go_spark.sources import (
        build_edge_table,
        synthesize_repos,
        verify_content_sha256,
    )

    import os

    repos = synthesize_repos(spark, n_files=300, seed=42)
    # per-row invariant as a REAL round-trip check (source vs re-read copy).
    # Path under .tmp/ (gitignored) keyed by the Spark applicationId:
    # reused (not leaked) within a session, private across concurrent
    # drivers (a fixed path races when compare.py and pytest overlap).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    td = os.path.join(pkg_parent, ".tmp")
    if not os.access(pkg_parent, os.W_OK):
        # read-only install (site-packages): fall back to the system tmp dir
        import tempfile

        td = os.path.join(tempfile.gettempdir(), "gcgs_tmp")
    rt = f"{td}/code_repos_roundtrip_{spark.sparkContext.applicationId}"
    _prune_roundtrip_dirs(td, keep=rt)
    repos.write.mode("overwrite").parquet(rt)
    _write_owner_marker(rt)
    ingested = spark.read.parquet(rt)
    verify_content_sha256(repos, ingested)
    return build_edge_table(ingested).select(
        "src_repo", "src_path", "dst_repo", "dst_path"
    )


@register(
    "code_graph_entropy",
    f"""WITH {_CODE_EDGES_SQL},
    deg AS (SELECT dst_repo, dst_path, CAST(COUNT(*) AS DOUBLE) AS d
            FROM code_edges GROUP BY 1, 2),
    agg AS (SELECT SUM(d) AS s, SUM(d*LOG2(d)) AS dlogd, COUNT(*) AS n FROM deg)
    SELECT ROUND(LOG2(s) - dlogd/s, 6) AS h_in,
           ROUND(((LOG2(s) - dlogd/s) - LOG2(4.0*(n-1))/2)
                 / (LOG2(CAST(n AS DOUBLE)) - LOG2(4.0*(n-1))/2), 6) AS norm_in,
           CAST(n AS BIGINT) AS n_in
    FROM agg""",
)
def q_code_graph_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship statistics on the code-import graph (the reference's
    `wikiEntropy -t total` shape on our payload)."""
    from graph_computing_go_spark.sources import build_edge_table, synthesize_repos

    edges = build_edge_table(synthesize_repos(spark, n_files=300, seed=42))
    df = structural_entropy(edges.select("src", "dst"))
    return df.select(
        F.round("h_in", 6).alias("h_in"),
        F.round("norm_in", 6).alias("norm_in"),
        F.col("n_in"),
    )


@register(
    "multimodal_features",
    """WITH m AS (
      SELECT doc_id AS media_id,
             (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1]
               AS modality,
             hex(encode(text)) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents),
    vals AS (
      SELECT media_id, modality, n_bytes,
             list_transform(range(1, n_bytes * 2 + 1, 2), i ->
               (strpos('0123456789ABCDEF', substr(h, CAST(i AS INT), 1)) - 1) * 16
               + (strpos('0123456789ABCDEF', substr(h, CAST(i AS INT) + 1, 1)) - 1))
               AS bytes
      FROM m)
    SELECT media_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes,
           ROUND(COALESCE(list_avg(bytes), 0.0), 6) AS mean_byte
    FROM vals""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction (Arrow mapInPandas, stubbed codec).
    Oracle re-derives n_bytes/mean_byte from hex(encode(text)) in DuckDB."""
    from graph_computing_go_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media(docs, "doc_id", "text"))
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


# --------------------------------------------------------------------------
# Label/taxonomy + set/window operators (P10, J7, J8, §2.5, §2.7)
# --------------------------------------------------------------------------

def _vertex_labels(edges: DataFrame) -> DataFrame:
    """Deterministic multi-label assignment for derived-graph vertices:
    everyone gets 'a'; even ids also 'b'; id%7<3 also 'c'."""
    ids = (
        # both endpoints in one scan of the edge table
        edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
    )
    return ids.select(
        "id",
        F.concat(
            F.array(F.lit("a")),
            F.when(F.col("id") % 2 == 0, F.array(F.lit("b"))).otherwise(
                F.array().cast("array<string>")
            ),
            F.when(F.col("id") % 7 < 3, F.array(F.lit("c"))).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("labels"),
    )


_VLABELS_SQL = """
    vl AS (SELECT id,
                  ['a'] || (CASE WHEN id % 2 = 0 THEN ['b'] ELSE [] END)
                        || (CASE WHEN id % 7 < 3 THEN ['c'] ELSE [] END)
                    AS labels
           FROM (SELECT DISTINCT src AS id FROM edges
                 UNION SELECT DISTINCT dst FROM edges))
"""


@register(
    "label_routing",
    f"""WITH {GRAPH_CTES},
    {_VLABELS_SQL}
    SELECT e.src, e.dst,
           unnest(list_intersect(ls.labels, ld.labels)) AS discipline
    FROM edges e
    JOIN vl ls ON e.src = ls.id
    JOIN vl ld ON e.dst = ld.id""",
)
def q_label_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (openAlexTopDsiplineDistanceComplexity.go:122-149): route each
    edge to every discipline shared by its endpoints."""
    from graph_computing_go_spark.operators.labels import route_edges_by_labels

    edges = derive_edges(spark, sf_dir)
    return route_edges_by_labels(edges, _vertex_labels(edges))


# --------------------------------------------------------------------------
# §3.3 lifecycle — per-(year, discipline) grouped distance complexity:
# S7-shaped weighted edges -> J7 label routing -> A6/A7 per work key, all in
# ONE grouped plan (the reference loops a DistanceGraph per (year, concept),
# openAlexTopDsiplineDistanceComplexity.go:120-179).  Year derives from
# l_orderkey arithmetic (3 years), disciplines from the shared vertex-label
# assignment; node categories are 'm{id%3}' with an extra 'mx' for id%5==0
# so ~20% of nodes are multi-category and the per-group COPY quirk
# (distanceComplexity.go:91-113) is exercised end-to-end in the oracle.
# --------------------------------------------------------------------------

_DDC_SQL = f"""WITH {GRAPH_CTES},
    {_VLABELS_SQL},
    raw3 AS (
      SELECT CAST(1995 + l_orderkey % 3 AS INT) AS year,
             CAST(l_orderkey % {GRAPH_MOD} AS BIGINT) AS src,
             CAST(l_partkey  % {GRAPH_MOD} AS BIGINT) AS dst
      FROM lineitem
      WHERE (l_orderkey % {GRAPH_MOD}) != (l_partkey % {GRAPH_MOD})
    ),
    routed AS (
      SELECT r.year, r.src, r.dst,
             unnest(list_intersect(ls.labels, ld.labels)) AS discipline
      FROM raw3 r JOIN vl ls ON r.src = ls.id JOIN vl ld ON r.dst = ld.id
    ),
    gwedges AS (
      SELECT year, discipline, GREATEST(src, dst) AS a, LEAST(src, dst) AS b,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM routed GROUP BY 1, 2, 3, 4
    ),
    gids AS (SELECT DISTINCT year, discipline, a AS id FROM gwedges
             UNION SELECT DISTINCT year, discipline, b FROM gwedges),
    gcats AS (SELECT year, discipline, id,
                     ['m' || CAST(id % 3 AS VARCHAR)]
                       || (CASE WHEN id % 5 = 0 THEN ['mx'] ELSE [] END) AS cats
              FROM gids),
    gmax AS (SELECT year, discipline, MAX(id) AS mx FROM gids GROUP BY 1, 2),
    copies AS (
      SELECT c.year, c.discipline, c.id AS orig, 'mx' AS cat,
             g.mx + ROW_NUMBER() OVER (PARTITION BY c.year, c.discipline
                                       ORDER BY c.id) AS copy_id
      FROM gcats c JOIN gmax g
        ON c.year = g.year AND c.discipline = g.discipline
      WHERE len(c.cats) > 1
    ),
    node_cat AS (SELECT year, discipline, id, cats[1] AS cat FROM gcats
                 UNION ALL
                 SELECT year, discipline, copy_id, cat FROM copies),
    copy_edges AS (
      SELECT w.year, w.discipline, c.copy_id AS a, w.b, w.w
      FROM gwedges w JOIN copies c
        ON w.year = c.year AND w.discipline = c.discipline AND w.a = c.orig
    ),
    e AS (SELECT year, discipline, a, b, w FROM gwedges
          UNION ALL SELECT year, discipline, a, b, w FROM copy_edges),
    incident AS (SELECT year, discipline, a AS id, w FROM e
                 UNION ALL SELECT year, discipline, b, w FROM e),
    pn AS (SELECT year, discipline, id, SUM(w) AS s,
                  LOG2(SUM(w)) - SUM(w*LOG2(w))/SUM(w) AS h
           FROM incident GROUP BY 1, 2, 3),
    gbig AS (SELECT year, discipline, SUM(h*s)/SUM(s) AS big
             FROM pn GROUP BY 1, 2),
    tagged AS (
      SELECT e.year, e.discipline, e.a, e.b, e.w,
             ca.cat AS cat_a, cb.cat AS cat_b
      FROM e
      JOIN node_cat ca ON e.year = ca.year AND e.discipline = ca.discipline
                       AND e.a = ca.id
      JOIN node_cat cb ON e.year = cb.year AND e.discipline = cb.discipline
                       AND e.b = cb.id
    ),
    gvall AS (SELECT year, discipline, SUM(w)*2 AS v FROM tagged GROUP BY 1, 2),
    intra AS (SELECT * FROM tagged WHERE cat_a = cat_b),
    ii AS (SELECT year, discipline, cat_a AS cat, a AS id, w FROM intra
           UNION ALL SELECT year, discipline, cat_a, b, w FROM intra),
    nh AS (SELECT year, discipline, cat, id, SUM(w) AS s,
                  LOG2(SUM(w)) - SUM(w*LOG2(w))/SUM(w) AS h
           FROM ii GROUP BY 1, 2, 3, 4),
    mi AS (SELECT year, discipline, cat_a AS cat, SUM(w)*2 AS inner
           FROM intra GROUP BY 1, 2, 3),
    hm AS (SELECT nh.year, nh.discipline, nh.cat,
                  SUM(nh.s*nh.h)/MAX(mi.inner) AS h_module,
                  MAX(mi.inner) AS inner
           FROM nh JOIN mi ON nh.year = mi.year AND nh.discipline = mi.discipline
                          AND nh.cat = mi.cat
           GROUP BY 1, 2, 3),
    cr AS (SELECT year, discipline, cat_a AS cat, w FROM tagged
           WHERE cat_a != cat_b
           UNION ALL
           SELECT year, discipline, cat_b, w FROM tagged WHERE cat_a != cat_b),
    oo AS (SELECT year, discipline, cat, SUM(w) AS outer FROM cr GROUP BY 1, 2, 3),
    glit AS (
      SELECT hm.year, hm.discipline,
             SUM(hm.h_module * hm.inner / v.v
                 - LOG2(hm.inner / v.v) * COALESCE(oo.outer, 0) / v.v) AS little
      FROM hm
      LEFT JOIN oo ON hm.year = oo.year AND hm.discipline = oo.discipline
                  AND hm.cat = oo.cat
      JOIN gvall v ON hm.year = v.year AND hm.discipline = v.discipline
      GROUP BY 1, 2
    )
    SELECT b.year, b.discipline, ROUND(b.big, 6) AS big,
           ROUND(l.little, 6) AS little
    FROM gbig b LEFT JOIN glit l
      ON b.year = l.year AND b.discipline = l.discipline"""


@register("discipline_distance_complexity", _DDC_SQL)
def q_discipline_distance_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 lifecycle (openAlexTopDsiplineDistanceComplexity.go:44-179 /
    wikiAcademicCircleDistanceComplexity.go:44-68): one weighted graph per
    (year, discipline), label-routed (J7), with per-group multi-category
    copies — computed in ONE grouped plan, no driver loop over work keys."""
    from graph_computing_go_spark.operators.labels import route_edges_by_labels

    li = load_table(spark, sf_dir, "lineitem")
    raw = li.select(
        (F.lit(1995) + F.col("l_orderkey") % 3).cast("int").alias("year"),
        (F.col("l_orderkey") % GRAPH_MOD).cast("long").alias("src"),
        (F.col("l_partkey") % GRAPH_MOD).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # labels need only the vertex-id SET, identical between the raw
    # multigraph and the distinct edge table — deriving from raw skips the
    # (src, dst)-pair distinct shuffle (ids partial-aggregate to <=GRAPH_MOD
    # rows per map task before the exchange)
    labels = _vertex_labels(raw.select("src", "dst"))
    routed = route_edges_by_labels(raw, labels, carry_cols=("year",))
    # cache the routed+grouped edge table: it feeds the canonical edges, the
    # per-group max-id aggregates, AND the id/category derivation — without
    # the cache the routing explode re-evaluates once per consumer
    wedges = routed.groupBy(
        "year",
        "discipline",
        F.greatest("src", "dst").alias("a"),
        F.least("src", "dst").alias("b"),
    ).agg(F.count("*").cast("double").alias("distance")).cache()
    # one scan of the cached wedges instead of two (explode both endpoints)
    ids = wedges.select(
        "year", "discipline", F.explode(F.array("a", "b")).alias("id")
    ).distinct()
    cats = ids.select(
        "year",
        "discipline",
        "id",
        F.concat(
            F.array(F.concat(F.lit("m"), (F.col("id") % 3).cast("string"))),
            F.when(F.col("id") % 5 == 0, F.array(F.lit("mx"))).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("cats"),
    )
    # wedges comes out of a groupBy on (year, discipline, greatest, least) —
    # already canonical and unique, so skip the re-canonicalizing shuffle
    df = distance_complexity(
        wedges, cats, group=["year", "discipline"], assume_canonical=True
    )
    # df is materialized (localCheckpoint inside distance_complexity), so the
    # routed-edge cache can retire with the call — except in the lazy
    # plan-audit mode, where unpersisting pre-collect would drop the shared
    # scan the un-materialized plan still needs
    if eager_results():
        wedges.unpersist()
    return df.select(
        "year",
        "discipline",
        F.round("big", 6).alias("big"),
        F.round("little", 6).alias("little"),
    )


@register(
    "dense_string_ids",
    """SELECT key, CAST(DENSE_RANK() OVER (ORDER BY key) AS BIGINT) AS dense_id
    FROM (SELECT DISTINCT p_name AS key FROM part)""",
)
def q_dense_string_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (openAlexLv2DistanceComplexity.go:154-175): deterministic dense id
    assignment for string keys (dense_rank, not monotonically_increasing_id)."""
    from graph_computing_go_spark.operators.labels import dense_string_ids

    return dense_string_ids(
        load_table(spark, sf_dir, "part").select(F.col("p_name")), "p_name"
    )


@register(
    "core_tag_parse",
    """SELECT p_partkey,
       array_to_string(list_sort(list_distinct(
         list_transform(
           list_filter([ 'lv1-' || p_brand || '-1998',
                         'lv2-' || p_type  || '-2001' ],
                       t -> t LIKE 'lv1-%'),
           t -> string_split(t, '-')[2]))), '|')
         AS subjects
    FROM part""",
)
def q_core_tag_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 (wikiMultilayersSubjectEntropy.go:47-63): parse lv{N}-{Subject}-{year}
    tags to level-1 subject arrays.

    The subject array is emitted as one sorted pipe-joined scalar string —
    the driver's hash canonicalizer sorts rows via pandas and cannot handle
    list-typed cells (CORRECTNESS_r01: unhashable type 'list')."""
    from graph_computing_go_spark.operators.labels import parse_core_tags

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.array(
            F.concat(F.lit("lv1-"), F.col("p_brand"), F.lit("-1998")),
            F.concat(F.lit("lv2-"), F.col("p_type"), F.lit("-2001")),
        ).alias("tags"),
    )
    return parse_core_tags(part, "tags", level=1).select(
        "p_partkey",
        F.concat_ws("|", F.sort_array("subjects")).alias("subjects"),
    )


@register(
    "anti_join_ledger",
    """SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)
def q_anti_join_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 anti-join (the task-ledger skip pattern,
    extractWikipediaDump.go:50-53): customers with no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey")


@register(
    "two_rank_universes",
    """SELECT c_custkey,
       CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INT)
         AS rank_total,
       CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey ASC) AS INT)
         AS rank_segment
    FROM customer""",
)
def q_two_rank_universes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 two rank universes over one table (openAlexEntropy.go:255-272
    total-vs-current ranks as two window columns).  The global (total) rank
    routes through global_row_number — no single-partition window; the
    segment rank is already key-partitioned and stays a plain window."""
    from graph_computing_go_spark.operators.graph import global_row_number

    cust = load_table(spark, sf_dir, "customer")
    w_seg = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = global_row_number(
        cust.select("c_custkey", "c_acctbal", "c_mktsegment"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        "rank_total",
    )
    return ranked.select(
        "c_custkey",
        F.col("rank_total").cast("int").alias("rank_total"),
        F.row_number().over(w_seg).alias("rank_segment"),
    )


@register(
    "rollup_summary",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       ROUND(CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE), 6) AS p50,
       ROUND(CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE), 6) AS p90,
       ROUND(CAST(quantile_disc(l_extendedprice, 0.99) AS DOUBLE), 6) AS p99
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def q_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 extras in one grain: grouping-set machinery (rollup over
    returnflag, linestatus) + exact discrete percentiles per grouping set
    (the sketch-free baseline; approx_percentile shares the plan shape but
    is not value-portable across engines, so the oracle pins the exact
    variant)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
            ),
            6,
        ).alias("p50"),
        F.round(
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"
            ),
            6,
        ).alias("p90"),
        F.round(
            F.expr(
                "percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)"
            ),
            6,
        ).alias("p99"),
    )


# --------------------------------------------------------------------------
# Flagship lifecycle: the yearly-snapshot entropy pipeline (SURVEY.md §3.1)
# Vertex years derive from id arithmetic (1995 + id % 8); the oracle unrolls
# one SQL block per (year, percent, rank_type) slice.
# --------------------------------------------------------------------------

_YEARS = [1997, 1999, 2001]
_YP_PERCENTS = (20, 60, 100)


def _yearly_oracle() -> str:
    blocks = []
    for y in sorted(_YEARS, reverse=True):
        for rank_type, cnt_col in (("total", "cnt_total"), ("current", "cnt_cur")):
            for p in _YP_PERCENTS:
                blocks.append(f"""
    SELECT {y} AS year, {p} AS percent, '{rank_type}' AS rank_type,
           (SELECT CAST(SUM(c) AS BIGINT) FROM hist_{y}_{rank_type}_{p}) AS n_vertices,
           (SELECT COUNT(*) FROM sub_{y}_{rank_type}_{p}) AS n_edges,
           (SELECT ROUND(LOG2(CAST(SUM(c) AS DOUBLE))
                         - SUM(c*LOG2(CAST(c AS DOUBLE)))/CAST(SUM(c) AS DOUBLE), 6)
            FROM hist_{y}_{rank_type}_{p}) AS dd_h_in,
           (SELECT ROUND(LOG2(SUM(d)) - SUM(d*LOG2(d))/SUM(d), 6)
            FROM pos_{y}_{rank_type}_{p}) AS se_h_in,
           (SELECT COUNT(*) FROM pos_{y}_{rank_type}_{p}) AS n_in""")
    # AS MATERIALIZED: DuckDB inlines plain CTEs, and this reference chain
    # (sel -> ranked -> cand -> cur -> e -> kept, each referenced 2-3x) blows
    # up multiplicatively without it (observed: minutes -> hours at sf0.1)
    ctes = []
    for y in sorted(_YEARS, reverse=True):
        ctes.append(f"""
    kept_{y} AS MATERIALIZED (SELECT id FROM vy WHERE year <= {y}),
    e_{y} AS MATERIALIZED (SELECT e.src, e.dst FROM edges e
              WHERE e.src IN (SELECT id FROM kept_{y})
                AND e.dst IN (SELECT id FROM kept_{y})),
    cur_{y} AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS cnt_cur
                             FROM e_{y} GROUP BY dst),
    cand_{y} AS MATERIALIZED (
        SELECT c.id, c.cnt_cur, COALESCE(t.cnt_total, 0) AS cnt_total
        FROM cur_{y} c LEFT JOIN tot t ON c.id = t.id
        WHERE c.cnt_cur >= 2),
    n_cand_{y} AS MATERIALIZED (SELECT COUNT(*) AS n FROM cand_{y})""")
        for rank_type, cnt_col in (("total", "cnt_total"), ("current", "cnt_cur")):
            ctes.append(f"""
    ranked_{y}_{rank_type} AS MATERIALIZED (
      SELECT id, ROW_NUMBER() OVER (ORDER BY {cnt_col} DESC, id ASC) AS rnk
      FROM cand_{y})""")
            for p in _YP_PERCENTS:
                ctes.append(f"""
    sel_{y}_{rank_type}_{p} AS MATERIALIZED (
      SELECT id FROM ranked_{y}_{rank_type}
      WHERE rnk <= CEIL((SELECT n FROM n_cand_{y}) * {p} / 100)),
    sub_{y}_{rank_type}_{p} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e_{y} e
      WHERE e.src IN (SELECT id FROM sel_{y}_{rank_type}_{p})
        AND e.dst IN (SELECT id FROM sel_{y}_{rank_type}_{p})),
    ind_{y}_{rank_type}_{p} AS MATERIALIZED (
      SELECT s.id, COALESCE(g.d, 0) AS d
      FROM sel_{y}_{rank_type}_{p} s
      LEFT JOIN (SELECT dst AS id, COUNT(*) AS d
                 FROM sub_{y}_{rank_type}_{p} GROUP BY dst) g ON s.id = g.id),
    hist_{y}_{rank_type}_{p} AS MATERIALIZED (
      SELECT d, COUNT(*) AS c FROM ind_{y}_{rank_type}_{p} GROUP BY d),
    pos_{y}_{rank_type}_{p} AS MATERIALIZED (
      SELECT CAST(d AS DOUBLE) AS d FROM ind_{y}_{rank_type}_{p} WHERE d > 0)""")
    return (
        f"WITH {GRAPH_CTES},\n"
        "    vy AS (SELECT id, 1995 + CAST(id % 8 AS INT) AS year FROM\n"
        "           (SELECT DISTINCT src AS id FROM edges\n"
        "            UNION SELECT DISTINCT dst FROM edges)),\n"
        "    tot AS (SELECT dst AS id, COUNT(*) AS cnt_total FROM edges GROUP BY dst),"
        + ",".join(ctes)
        + "\n"
        + "\n    UNION ALL".join(blocks)
    )


@register("yearly_entropy", _yearly_oracle())
def q_yearly_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline (openAlexEntropy.go:136-311): yearly snapshots ×
    percent ladder × {total, current} rank universes → per-slice entropies."""
    from graph_computing_go_spark.plans.yearly import yearly_entropy_pipeline

    edges = derive_edges(spark, sf_dir).cache()
    ids = (
        # both endpoints in one scan of the edge table
        edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
    )
    vertices = ids.select("id", (F.lit(1995) + (F.col("id") % 8).cast("int")).alias("year"))
    return yearly_entropy_pipeline(
        vertices, edges, _YEARS, percents=_YP_PERCENTS
    )


# --------------------------------------------------------------------------
# Ingest snapshot semantics (§2.8 date handling): RFC3339 timestamp parse +
# nearest-year-end revision selection + gap-year tag forwarding
# (/root/reference/internal/extractWikipediadump/extractWikipediaDump.go:136-178)
# --------------------------------------------------------------------------

_SNAP_END_YEAR = 2008  # the reference pins endYear=2024; scaled to the data


@register(
    "snapshot_year_tags",
    f"""WITH rev AS (
      SELECT o_orderkey % 311 AS page_id, o_orderkey AS rev_id,
             printf('%04d-%02d-%02dT%02d:%02d:%02dZ',
                    1998 + o_orderkey % 11, 1 + o_custkey % 12,
                    1 + o_orderkey % 28, o_orderkey % 24,
                    o_custkey % 60, o_orderkey % 60) AS ts_str
      FROM orders),
    parsed AS (
      SELECT page_id, rev_id, strptime(ts_str, '%Y-%m-%dT%H:%M:%SZ') AS ts
      FROM rev),
    recent AS (SELECT * FROM parsed WHERE year(ts) >= 2000),
    snap AS (
      SELECT page_id, year(ts) AS yr, rev_id
      FROM (SELECT *,
                   ABS(epoch(ts) - epoch(make_timestamp(year(ts), 12, 31,
                                                        23, 59, 59.0)))
                     AS diff
            FROM recent)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY page_id, year(ts)
                                 ORDER BY diff, ts, rev_id) = 1),
    tagged AS (
      SELECT page_id, rev_id,
             unnest(range(yr,
                          COALESCE(LEAD(yr) OVER (PARTITION BY page_id
                                                  ORDER BY yr),
                                   {_SNAP_END_YEAR + 1}))) AS year
      FROM snap)
    SELECT page_id, CAST(year AS INT) AS year, rev_id FROM tagged""",
)
def q_snapshot_year_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest snapshot selection (extractWikipediaDump.go:136-178): parse
    RFC3339 revision timestamps, drop pre-2000 revisions, keep per (page,
    year) the revision closest to that year's end (ties → earlier revision,
    mirroring the sorted walk that replaces only on strictly-smaller diff),
    then forward-fill gap years onto the last snapshot (YearTags).

    Revisions synthesize deterministically from orders; output is the
    exploded (page_id, year, rev_id) tag table."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.select(
        (F.col("o_orderkey") % 311).alias("page_id"),
        F.col("o_orderkey").alias("rev_id"),
        F.format_string(
            "%04d-%02d-%02dT%02d:%02d:%02dZ",
            (F.lit(1998) + F.col("o_orderkey") % 11).cast("int"),
            (F.lit(1) + F.col("o_custkey") % 12).cast("int"),
            (F.lit(1) + F.col("o_orderkey") % 28).cast("int"),
            (F.col("o_orderkey") % 24).cast("int"),
            (F.col("o_custkey") % 60).cast("int"),
            (F.col("o_orderkey") % 60).cast("int"),
        ).alias("ts_str"),
    )
    parsed = rev.withColumn(
        "ts", F.to_timestamp("ts_str", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    ).filter(F.year("ts") >= 2000)
    year_end = F.to_timestamp(
        F.format_string("%04d-12-31 23:59:59", F.year("ts"))
    )
    diffed = parsed.select(
        "page_id",
        "rev_id",
        "ts",
        F.year("ts").alias("yr"),
        F.abs(F.unix_timestamp("ts") - F.unix_timestamp(year_end)).alias("diff"),
    )
    w_pick = Window.partitionBy("page_id", "yr").orderBy("diff", "ts", "rev_id")
    snap = (
        diffed.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("page_id", "yr", "rev_id")
    )
    w_next = Window.partitionBy("page_id").orderBy("yr")
    spans = snap.select(
        "page_id",
        "rev_id",
        "yr",
        F.coalesce(
            F.lead("yr").over(w_next) - 1, F.lit(_SNAP_END_YEAR)
        ).alias("tag_end"),
    )
    tagged = spans.select(
        "page_id",
        "rev_id",
        F.explode(F.sequence(F.col("yr"), F.col("tag_end"))).alias("year"),
    )
    return tagged.select("page_id", F.col("year").cast("int").alias("year"), "rev_id")


# --------------------------------------------------------------------------
# from_json ingest (§2.8: the gRPC-JSON decode of parsed wikitext,
# extractWikipediaDump.go:235-263 → from_json with an explicit schema)
# --------------------------------------------------------------------------


@register(
    "from_json_ingest",
    """WITH j AS (
      SELECT doc_id,
             to_json({'title': 'doc-' || CAST(doc_id AS VARCHAR),
                      'ns': CAST(doc_id % 3 AS INT),
                      'links': [lang, source]}) AS raw
      FROM documents)
    SELECT doc_id,
           json_extract_string(raw, '$.title') AS title,
           CAST(json_extract(raw, '$.ns') AS INT) AS ns,
           CAST(json_array_length(json_extract(raw, '$.links')) AS INT)
             AS n_links,
           json_extract_string(raw, '$.links[0]') AS first_link
    FROM j""",
)
def q_from_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 from_json ingest: nested JSON documents decoded against an
    explicit schema (the reference decodes gRPC JSON into structs,
    extractWikipediaDump.go:235-263).  The JSON string is synthesized
    round-trip (to_json → from_json) so the parse path is genuinely
    exercised on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    js = docs.select(
        "doc_id",
        F.to_json(
            F.struct(
                F.concat(F.lit("doc-"), F.col("doc_id")).alias("title"),
                (F.col("doc_id") % 3).cast("int").alias("ns"),
                F.array("lang", "source").alias("links"),
            )
        ).alias("raw"),
    )
    schema = "struct<title:string, ns:int, links:array<string>>"
    parsed = js.select("doc_id", F.from_json("raw", schema).alias("p"))
    return parsed.select(
        "doc_id",
        F.col("p.title").alias("title"),
        F.col("p.ns").alias("ns"),
        F.size("p.links").alias("n_links"),
        F.element_at("p.links", 1).alias("first_link"),
    )


# --------------------------------------------------------------------------
# Per-subject entropy lifecycle (wikiSubjectEntropy.go:64-95 +
# openAlexMultilayerSubjectEntropy.go:130-160): subject scan → academic
# circle union → shrink + min-in-degree → per-subject entropies
# --------------------------------------------------------------------------

_SUBJ_YEARS = [1997, 2001]


def _subject_oracle() -> str:
    blocks = []
    ctes = []
    for y in sorted(_SUBJ_YEARS, reverse=True):
        ctes.append(f"""
    mem_{y} AS MATERIALIZED (
      SELECT id, unnest(subjects) AS subject FROM vs WHERE year <= {y}),
    circ_{y} AS MATERIALIZED (SELECT DISTINCT id FROM mem_{y}),
    e_{y} AS MATERIALIZED (
      SELECT e.src, e.dst FROM edges e
      WHERE e.src IN (SELECT id FROM circ_{y})
        AND e.dst IN (SELECT id FROM circ_{y})),
    keep_{y} AS MATERIALIZED (
      SELECT dst AS id FROM e_{y} GROUP BY dst HAVING COUNT(*) >= 2),
    memk_{y} AS MATERIALIZED (
      SELECT m.id, m.subject FROM mem_{y} m
      WHERE m.id IN (SELECT id FROM keep_{y})),
    es_{y} AS MATERIALIZED (
      SELECT ms.subject, e.src, e.dst FROM e_{y} e
      JOIN memk_{y} ms ON e.src = ms.id
      JOIN memk_{y} md ON e.dst = md.id AND ms.subject = md.subject),
    deg_{y} AS (SELECT subject, dst AS id, COUNT(*) AS d
                FROM es_{y} GROUP BY 1, 2),
    ind_{y} AS MATERIALIZED (
      SELECT m.subject, COALESCE(g.d, 0) AS d
      FROM memk_{y} m
      LEFT JOIN deg_{y} g ON m.subject = g.subject AND m.id = g.id),
    hist_{y} AS (SELECT subject, d, COUNT(*) AS c FROM ind_{y} GROUP BY 1, 2),
    dd_{y} AS (SELECT subject,
                      LOG2(CAST(SUM(c) AS DOUBLE))
                        - SUM(c*LOG2(CAST(c AS DOUBLE)))/SUM(c) AS dd_h_in,
                      CAST(SUM(c) AS BIGINT) AS n_vertices
               FROM hist_{y} GROUP BY subject),
    se_{y} AS (SELECT subject,
                      LOG2(SUM(d)) - SUM(d*LOG2(d))/SUM(d) AS se_h_in,
                      COUNT(*) AS n_in
               FROM (SELECT subject, CAST(d AS DOUBLE) AS d
                     FROM ind_{y} WHERE d > 0) GROUP BY subject),
    ne_{y} AS (SELECT subject, COUNT(*) AS n_edges FROM es_{y}
               GROUP BY subject)""")
        blocks.append(f"""
    SELECT {y} AS year, dd.subject, dd.n_vertices,
           COALESCE(ne.n_edges, 0) AS n_edges,
           ROUND(dd.dd_h_in, 6) AS dd_h_in,
           ROUND(se.se_h_in, 6) AS se_h_in,
           COALESCE(se.n_in, 0) AS n_in
    FROM dd_{y} dd
    LEFT JOIN se_{y} se ON dd.subject = se.subject
    LEFT JOIN ne_{y} ne ON dd.subject = ne.subject""")
    return (
        f"WITH {GRAPH_CTES},\n"
        "    v AS (SELECT DISTINCT src AS id FROM edges\n"
        "          UNION SELECT DISTINCT dst FROM edges),\n"
        "    vs AS (SELECT id, 1995 + CAST(id % 8 AS INT) AS year,\n"
        "                  (CASE WHEN id % 3 = 0 THEN ['alpha'] ELSE [] END)\n"
        "               || (CASE WHEN id % 5 < 2 THEN ['beta'] ELSE [] END)\n"
        "               || (CASE WHEN id % 7 < 3 THEN ['gamma'] ELSE [] END)\n"
        "                    AS subjects\n"
        "           FROM v)," + ",".join(ctes) + "\n"
        + "\n    UNION ALL".join(blocks)
    )


@register("subject_entropy_lifecycle", _subject_oracle())
def q_subject_entropy_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subject lifecycle: subject-tagged vertex sets (S4) unioned into
    the academic circle, circle-shrunk edges, one min-in-degree gate, then
    per-subject induced-graph entropies per year (wikiSubjectEntropy.go:64-95,
    openAlexMultilayerSubjectEntropy.go:142-153)."""
    from graph_computing_go_spark.plans.subjects import subject_entropy_lifecycle

    edges = derive_edges(spark, sf_dir).cache()
    ids = (
        # both endpoints in one scan of the edge table
        edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
    )
    empty = F.array().cast("array<string>")
    vertices = ids.select(
        "id",
        (F.lit(1995) + (F.col("id") % 8).cast("int")).alias("year"),
        F.concat(
            F.when(F.col("id") % 3 == 0, F.array(F.lit("alpha"))).otherwise(empty),
            F.when(F.col("id") % 5 < 2, F.array(F.lit("beta"))).otherwise(empty),
            F.when(F.col("id") % 7 < 3, F.array(F.lit("gamma"))).otherwise(empty),
        ).alias("subjects"),
    )
    df = subject_entropy_lifecycle(vertices, edges, _SUBJ_YEARS)
    # df is materialized inside (localCheckpoint) — the edge cache can
    # retire with the call; lazy plan-audit mode keeps it
    if eager_results():
        edges.unpersist()
    return df


# --------------------------------------------------------------------------
# Filtered-scan patterns S3/S4/S6 (array predicates pushed into the scan
# pipeline; the reference's mongo server-side filters,
# mongoClient.go:115-161, mongo.go:184-231)
# --------------------------------------------------------------------------

_DOC_TAGS = """
    tagged AS (SELECT doc_id, lang, source,
                      [lang, source, 'y' || CAST(doc_id % 5 AS VARCHAR)] AS tags
               FROM documents)
"""


def _doc_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.array(
            F.col("lang"),
            F.col("source"),
            F.concat(F.lit("y"), (F.col("doc_id") % 5).cast("string")),
        ).alias("tags"),
    )


@register(
    "scan_by_array_contains",
    f"""WITH {_DOC_TAGS}
    SELECT doc_id, lang FROM tagged WHERE list_contains(tags, 'y3')""",
)
def q_scan_by_array_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (mongoClient.go:115-137): array_contains(year_tags, y) scan filter."""
    return (
        _doc_tags(spark, sf_dir)
        .filter(F.array_contains("tags", "y3"))
        .select("doc_id", "lang")
    )


@register(
    "scan_by_arrays_overlap",
    f"""WITH {_DOC_TAGS}
    SELECT doc_id, source FROM tagged
    WHERE list_has_any(tags, ['src1', 'src2', 'es'])""",
)
def q_scan_by_arrays_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (mongoClient.go:139-161): {tags: {$in: [...]}} scan filter."""
    return (
        _doc_tags(spark, sf_dir)
        .filter(
            F.arrays_overlap(
                "tags", F.array(F.lit("src1"), F.lit("src2"), F.lit("es"))
            )
        )
        .select("doc_id", "source")
    )


@register(
    "scan_by_ancestor",
    """WITH anc AS (
      SELECT c.c_custkey,
             [{'name': r.r_name, 'level': 0}, {'name': n.n_name, 'level': 1}]
               AS ancestors
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey)
    SELECT c_custkey FROM anc
    WHERE len(list_filter(ancestors, a -> a.name = 'ASIA')) > 0""",
)
def q_scan_by_ancestor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 (mongo.go:184-201): exists() over a struct-array ancestor list."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    anc = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            F.array(
                F.struct(F.col("r_name").alias("name"), F.lit(0).alias("level")),
                F.struct(F.col("n_name").alias("name"), F.lit(1).alias("level")),
            ).alias("ancestors"),
        )
    )
    return anc.filter(
        F.exists("ancestors", lambda a: a["name"] == F.lit("ASIA"))
    ).select("c_custkey")


@register(
    "ivf_ann_topk",
    f"""WITH {_EMB_NORMS_SQL},
    cd AS (SELECT c.vec_id, g.k AS k,
                  SUM(c.x * (((1103515245 * (g.k * 997 + (c.i - 1)) + 54321)
                              % 2147483648) / 2147483648.0 - 0.5)) AS dot
           FROM comp c, generate_series(0, 7) g(k)
           GROUP BY c.vec_id, g.k),
    assign AS (SELECT vec_id, k AS centroid FROM cd
               QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, k ASC) = 1),
    q AS (SELECT vec_id FROM embeddings WHERE vec_id < 5),
    probes AS (SELECT vec_id, k AS centroid FROM cd
               WHERE vec_id IN (SELECT vec_id FROM q)
               QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, k ASC) <= 2),
    dots AS (SELECT c.vec_id AS c_id, qc.vec_id AS q_id, SUM(c.x * qc.x) AS dot
             FROM comp c JOIN comp qc
               ON c.i = qc.i AND qc.vec_id IN (SELECT vec_id FROM q)
             WHERE c.vec_id != qc.vec_id
             GROUP BY c.vec_id, qc.vec_id),
    scored AS (SELECT DISTINCT d.q_id, d.c_id,
                      ROUND(d.dot / (nc.nrm * nq.nrm), 6) AS cosine
               FROM dots d
               JOIN assign ac ON d.c_id = ac.vec_id
               JOIN probes pq ON d.q_id = pq.vec_id
                             AND ac.centroid = pq.centroid
               JOIN norms nc ON d.c_id = nc.vec_id
               JOIN norms nq ON d.q_id = nq.vec_id)
    SELECT q_id, c_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id ASC) AS INT)
             AS rank
    FROM scored
    QUALIFY rank <= 5""",
)
def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: inverted lists on 8 deterministic centroids, 2-probe search,
    exact re-rank (the task's IVF scale path for similarity search)."""
    from graph_computing_go_spark.operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_centroids=8, n_probe=2
    )


@register(
    "embedding_near_dup",
    f"""WITH {_EMB_NORMS_SQL},
    planes AS (SELECT c.vec_id, g.p AS p,
                      SUM(c.x * (((1103515245 * (g.p * 64 + (c.i - 1)) + 12345)
                                  % 2147483648) / 2147483648.0 - 0.5)) AS dot
               FROM comp c, generate_series(0, 7) g(p)
               GROUP BY c.vec_id, g.p),
    sig AS (SELECT vec_id,
                   CAST(SUM(CASE WHEN dot > 0 THEN CAST(POWER(2, p) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM planes GROUP BY vec_id),
    cand AS (SELECT l.vec_id AS a, r.vec_id AS b
             FROM sig l JOIN sig r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
    dots AS (SELECT c.a, c.b, SUM(ca.x * cb.x) AS dot
             FROM cand c
             JOIN comp ca ON ca.vec_id = c.a
             JOIN comp cb ON cb.vec_id = c.b AND ca.i = cb.i
             GROUP BY c.a, c.b),
    scored AS (SELECT d.a, d.b, ROUND(d.dot/(na.nrm*nb.nrm), 6) AS cosine
               FROM dots d JOIN norms na ON d.a = na.vec_id
               JOIN norms nb ON d.b = nb.vec_id)
    SELECT a, b, cosine, LEAST(a, b) AS keep_id
    FROM scored WHERE cosine >= 0.3""",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH candidate generation, threshold
    0.3 — the synthetic embeddings have no >0.95 dups, so the oracle checks a
    non-trivial pair set at a lower threshold)."""
    from graph_computing_go_spark.operators.dedup import embedding_near_dup

    return embedding_near_dup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "wiki_degree_quirk_histograms",
    """WITH pages AS (
      SELECT doc_id,
             list_slice(string_split_regex(trim(text), '\\s+'),
                        1, CAST(doc_id % 5 AS INT)) AS links_out,
             list_slice(string_split_regex(trim(text), '\\s+'),
                        1, CAST(doc_id % 3 AS INT)) AS links_out_ids
      FROM documents),
    u AS (SELECT 'links_in' AS kind, len(links_out_ids) AS degree FROM pages
          UNION ALL
          SELECT 'links_out', len(links_out) FROM pages)
    SELECT kind, CAST(degree AS INT) AS degree, COUNT(*) AS n_nodes
    FROM u GROUP BY kind, degree""",
)
def q_wiki_degree_quirk_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 faithfulness quirk (degreeStats.go:33-38): 'links_in' histograms
    the RESOLVED out-degree, 'links_out' the raw out-link count.  Synthetic
    pages: raw links = first doc_id%5 tokens, resolved = first doc_id%3."""
    from graph_computing_go_spark.operators.labels import wiki_degree_histograms
    from graph_computing_go_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("doc_id").alias("id"),
        F.slice(tokens_col("text"), 1, (F.col("doc_id") % 5).cast("int")).alias(
            "links_out"
        ),
        F.slice(tokens_col("text"), 1, (F.col("doc_id") % 3).cast("int")).alias(
            "links_out_ids"
        ),
    )
    return wiki_degree_histograms(pages)


# --------------------------------------------------------------------------
# Unregistered parity functions (§2.7 extras, classic multi-join).
#
# The driver verifies at most 50 queries per round; these two overlapped
# other green rows (revenue_per_nation's star-join shape is a superset of
# pricing_summary+anti_join_ledger machinery; subject_union_vertices'
# union-dedup is inside subject_entropy_lifecycle), so they were pruned
# from the registry (VERDICT r2 missing #2) and stay oracle-checked by
# tests/test_pruned_parity.py against the SQL below instead.
# --------------------------------------------------------------------------

REVENUE_PER_NATION_SQL = """SELECT n.n_name,
       COUNT(*) AS n_lineitems,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name"""


def q_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic 4-way star join + agg (fact ⋈ dims with broadcastable
    nation): the multi-join shape every analytics engine must get right."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


SUBJECT_UNION_SQL = f"""WITH {GRAPH_CTES}
    SELECT id, COUNT(*) AS n_subjects FROM (
      SELECT DISTINCT dst AS id, 'hub' AS subject FROM edges
      GROUP BY dst HAVING COUNT(*) >= 100
      UNION
      SELECT DISTINCT src AS id, 'source' AS subject FROM edges
      GROUP BY src HAVING COUNT(*) >= 100
    ) GROUP BY id"""


def q_subject_union_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 union of per-subject vertex sets with dedup
    (openAlexMultilayerSubjectEntropy.go:142-148: per-subject maps merged
    into one vertex universe) — here 'hub' (in-deg>=100) ∪ 'source'
    (out-deg>=100) with per-vertex membership counts."""
    edges = derive_edges(spark, sf_dir)
    hubs = (
        edges.groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 100)
        .select("id", F.lit("hub").alias("subject"))
    )
    sources = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 100)
        .select("id", F.lit("source").alias("subject"))
    )
    return (
        hubs.unionByName(sources)
        .dropDuplicates(["id", "subject"])
        .groupBy("id")
        .agg(F.count("*").alias("n_subjects"))
    )


# (graph_shrink's J5 shrink + in-degree now ships inside
# subgraph_induction's stage-labeled rows — see q_subgraph_induction.)
