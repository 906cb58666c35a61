"""Label/taxonomy operators (reference ops P10, J7, J8, A2-quirk).

- ``parse_core_tags`` — P10 (/root/reference/internal/wikiMultilayersSubjectEntropy/
  wikiMultilayersSubjectEntropy.go:47-63): tags of the form
  ``lv{N}-{Subject}-{year}`` are filtered to a level + whitelist and
  projected to subject names (array higher-order functions, no UDF).
- ``route_edges_by_labels`` — J7 (openAlexTopDsiplineDistanceComplexity.go:122-149):
  an edge belongs to every discipline in the intersection of its endpoints'
  label arrays; one output row per (edge, discipline) via
  ``explode(array_intersect(...))``.
- ``dense_string_ids`` — J8 (openAlexLv2DistanceComplexity.go:154-175): the
  reference assigns sequential ids on first sight (iteration-order
  dependent); the deterministic Spark equivalent is dense_rank over the
  sorted key — stable across runs (SURVEY.md §7 hard-part 1), never
  monotonically_increasing_id.
- ``wiki_degree_histograms`` — the A2 faithfulness quirk
  (internal/wikiEntropy/degreeStats.go:33-38): "linksInStats" actually
  histograms the RESOLVED out-degree (len(PageLinksOutIDs)) and
  "linksOutStats" the RAW out-link count — reproduced exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_core_tags(
    df: DataFrame,
    tag_col: str = "tags",
    level: int = 1,
    whitelist: list[str] | None = None,
) -> DataFrame:
    """Adds ``subjects: array<string>`` parsed from ``lv{N}-{Subject}-{year}``
    tags at the requested level (and whitelist when given)."""
    prefix = f"lv{level}-"
    lv = F.filter(F.col(tag_col), lambda t: t.startswith(prefix))
    subjects = F.transform(lv, lambda t: F.split_part(t, F.lit("-"), F.lit(2)))
    if whitelist is not None:
        wl = F.array(*[F.lit(w) for w in whitelist])
        subjects = F.filter(subjects, lambda s: F.array_contains(wl, s))
    return df.withColumn("subjects", F.array_distinct(subjects))


def route_edges_by_labels(
    edges: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "labels",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(carry..., src, dst, discipline): one row per discipline shared by
    both endpoints; edges with empty intersection drop out (the reference
    skips them, openAlexTopDsiplineDistanceComplexity.go:125-133).
    ``carry_cols`` names extra edge columns (e.g. ``("year",)``) preserved
    through the routing — the reference's per-(year, discipline) work-key
    fan-out (:126-134)."""
    lab = labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("labels"))
    j = (
        edges.join(
            lab.select(F.col("id").alias("src"), F.col("labels").alias("l_src")), "src"
        ).join(
            lab.select(F.col("id").alias("dst"), F.col("labels").alias("l_dst")), "dst"
        )
    )
    return j.select(
        *carry_cols,
        "src",
        "dst",
        F.explode(F.array_intersect("l_src", "l_dst")).alias("discipline"),
    )


def dense_string_ids(df: DataFrame, key_col: str) -> DataFrame:
    """(key, dense_id): deterministic 1-based dense ids ordered by key.

    Keys are distinct, so dense_rank == row_number and the ranking routes
    through ``global_row_number`` (range-partitioned sort + per-partition
    offsets) — no single-partition exchange even at 10^9+ keys."""
    from graph_computing_go_spark.operators.graph import global_row_number

    keys = df.select(F.col(key_col).alias("key")).distinct()
    return global_row_number(keys, [F.asc("key")], "dense_id").select(
        "key", F.col("dense_id").cast("long").alias("dense_id")
    )


def wiki_degree_histograms(pages: DataFrame) -> DataFrame:
    """(kind, degree, n_nodes) with the reference's naming quirk preserved:
    kind='links_in' histograms size(resolved out-ids) and kind='links_out'
    histograms size(raw out-links) (degreeStats.go:33-38 — both are
    out-degrees; the names are the reference's).

    ``pages``: (id, links_out array, links_out_ids array) with redirects
    already dropped by the caller (degreeStats.go:33-35).
    """
    resolved = pages.select(
        F.lit("links_in").alias("kind"), F.size("links_out_ids").alias("degree")
    )
    raw = pages.select(
        F.lit("links_out").alias("kind"), F.size("links_out").alias("degree")
    )
    return (
        resolved.unionByName(raw)
        .groupBy("kind", "degree")
        .agg(F.count("*").alias("n_nodes"))
    )
