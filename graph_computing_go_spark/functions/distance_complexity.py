"""Distance complexity (weighted-graph entropy) — reference ops A6/A7.

DataFrame re-expression of
/root/reference/internal/distanceComplexity/distanceComplexity.go:151-287.

Input model: undirected weighted edges stored once under the canonical
(larger-id, smaller-id) key (distanceComplexity.go:50-62); categories are an
optional per-node label list (Categroy, first element wins:
distanceComplexity.go:167,171).

**big** (:242-281): every edge contributes its weight to BOTH endpoints'
incident lists — membership in the node table is NOT checked.  Per node i:
R_i = sum of incident weights, H_i = -sum (w/R_i) log2(w/R_i); result
= sum_i H_i * R_i / G with G = sum_i R_i.

**little** (:156-240): only edges whose two endpoints are both known nodes
count.  vall = 2*sum(w) over those edges.  Intra-module edges (cat(a)==cat(b))
feed per-node incident lists; inner_M = 2*sum intra w; hModule =
sum_i (s_i/inner_M)*H_i; outer_M = sum of cross-module w (counted once per
side).  little = sum over modules WITH at least one intra edge of
[ hModule*inner_M/vall - log2(inner_M/vall)*outer_M/vall ] — modules that
only have cross edges are dropped entirely (the reference iterates
moduleInnerNodeDistanceTotalMap, :195), a quirk we preserve.

**Cross-category copies** (:91-113): nodes with k>1 categories spawn k-1
copies; a copy shares the original's *a-side* distance map only
(``c.distanceMap[newNodeID] = c.distanceMap[item.ID]``, :109) — edges where
the original sits on the smaller-id side are NOT duplicated.  Preserved
verbatim (it changes results for multi-category inputs).

Goldens: distanceComplexity_test.go:31-36,54-59,86-91 — six values, +-1e-9
(tests/test_goldens_distance.py).

Scale: big is one explode-both-directions + one groupBy(node) using the
one-pass identity H = log2(R) - sum(w log2 w)/R; little is the same shape
grouped by (module, node) then (module).  No driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_computing_go_spark.operators.graph import global_row_number


def _canonical(wedges: DataFrame) -> DataFrame:
    """Store each undirected edge once under (a=max, b=min) — last-wins dedup
    is the caller's concern (the reference overwrites on re-insert)."""
    return wedges.select(
        F.greatest("a", "b").alias("a"),
        F.least("a", "b").alias("b"),
        F.col("distance").cast("double").alias("w"),
    ).dropDuplicates(["a", "b"])


def _with_copies(wedges: DataFrame, categories: DataFrame):
    """Apply the category-copy quirk; return (edges, node_cat(id, cat))."""
    # lazy max-id: 1-row aggregates broadcast-crossJoined instead of two
    # eager collect jobs per invocation
    max_c = categories.agg(
        F.coalesce(F.max("id"), F.lit(0)).alias("__mc")
    )
    max_e = wedges.agg(
        F.coalesce(F.greatest(F.max("a"), F.max("b")), F.lit(0)).alias("__me")
    )
    max_df = max_c.crossJoin(max_e).select(
        F.greatest("__mc", "__me").alias("__max_id")
    )

    multi = categories.filter(F.size("cats") > 1)
    # fresh ids via the range-partitioned global rank — same (id, pos) asc
    # ordering as the old single-partition global window (goldens are
    # bit-identical), but scale-safe when most nodes carry 2+ categories
    copies = (
        global_row_number(
            multi.select("id", F.posexplode("cats").alias("pos", "cat")).filter(
                F.col("pos") >= 1
            ),
            [F.asc("id"), F.asc("pos")],
            "__rn",
        )
        .crossJoin(F.broadcast(max_df))
        .withColumn("copy_id", F.col("__max_id") + F.col("__rn"))
        .drop("__max_id", "__rn")
    )
    node_cat = categories.select(
        "id", F.element_at("cats", 1).alias("cat")
    ).unionByName(copies.select(F.col("copy_id").alias("id"), "cat"))

    # a-side-only duplication (distanceComplexity.go:109)
    cm = F.broadcast(copies.select(F.col("id").alias("orig"), "copy_id"))
    copy_edges = wedges.join(cm, wedges.a == cm.orig).select(
        F.col("copy_id").alias("a"), "b", "w"
    )
    return wedges.unionByName(copy_edges), node_cat


def _node_entropy(incident: DataFrame, group: list[str]) -> DataFrame:
    """Per (group..., id): s = sum w, h = -sum (w/s) log2(w/s), one pass."""
    return incident.groupBy(*group, "id").agg(
        F.sum("w").alias("s"),
        (
            F.log2(F.sum("w")) - F.sum(F.col("w") * F.log2("w")) / F.sum("w")
        ).alias("h"),
    )


def distance_complexity(
    wedges: DataFrame, categories: DataFrame | None = None
) -> DataFrame:
    """One row (big, little).  ``wedges``: (a, b, distance>0);
    ``categories``: (id, cats array<string>) or None → little is null."""
    e = _canonical(wedges)
    node_cat = None
    if categories is not None:
        e, node_cat = _with_copies(e, categories)
    e = e.cache()

    # ---- big: no membership check, copies' shared maps already materialized
    incident = e.select(F.col("a").alias("id"), "w").unionByName(
        e.select(F.col("b").alias("id"), "w")
    )
    per_node = _node_entropy(incident, [])
    big = per_node.agg(
        (F.sum(F.col("h") * F.col("s")) / F.sum("s")).alias("big")
    )

    if node_cat is None:
        return big.select("big", F.lit(None).cast("double").alias("little"))

    # vertex-grain table: NO broadcast hint (billion-vertex OOM risk); the
    # copy maps above stay broadcast — they are genuinely small
    nc = node_cat
    tagged = (
        e.join(nc.select(F.col("id").alias("a"), F.col("cat").alias("cat_a")), "a")
        .join(nc.select(F.col("id").alias("b"), F.col("cat").alias("cat_b")), "b")
    ).cache()

    vall = tagged.agg((F.sum("w") * 2).alias("vall"))

    intra = tagged.filter(F.col("cat_a") == F.col("cat_b"))
    intra_incident = intra.select(
        F.col("cat_a").alias("cat"), F.col("a").alias("id"), "w"
    ).unionByName(intra.select(F.col("cat_a").alias("cat"), F.col("b").alias("id"), "w"))
    node_h = _node_entropy(intra_incident, ["cat"])
    mod_inner = intra.groupBy(F.col("cat_a").alias("cat")).agg(
        (F.sum("w") * 2).alias("inner")
    )
    # hModule = sum_i (s_i / inner) * h_i
    h_module = (
        node_h.join(mod_inner, "cat")
        .groupBy("cat")
        .agg(
            (F.sum(F.col("s") * F.col("h")) / F.first("inner")).alias("h_module"),
            F.first("inner").alias("inner"),
        )
    )
    cross = tagged.filter(F.col("cat_a") != F.col("cat_b"))
    outer = (
        cross.select(F.col("cat_a").alias("cat"), "w")
        .unionByName(cross.select(F.col("cat_b").alias("cat"), "w"))
        .groupBy("cat")
        .agg(F.sum("w").alias("outer"))
    )
    per_mod = (
        h_module.join(outer, "cat", "left")
        .crossJoin(F.broadcast(vall))
        .select(
            (
                F.col("h_module") * F.col("inner") / F.col("vall")
                - F.log2(F.col("inner") / F.col("vall"))
                * F.coalesce("outer", F.lit(0.0))
                / F.col("vall")
            ).alias("term")
        )
    )
    little = per_mod.agg(F.sum("term").alias("little"))
    return big.crossJoin(little)
