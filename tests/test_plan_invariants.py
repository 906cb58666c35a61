"""Plan-shape regression tests for the zero-exchange invariants (VERDICT
r3 #9): the PERF.md §11-13 rewrites removed corpus-sized exchanges from
language-ID, SimHash, the MinHash/LSH candidate path, and the tag joins of
grouped distance complexity.  These were plan-verified by hand; pin them
so a future "simplification" cannot silently reintroduce a corpus-grain
shuffle.  Assertions key on Exchange NODES / their partitioning columns,
not total stage counts (AQE reshapes those freely)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=100):
    # repartition(5) destroys spark.range's RangePartitioning(id) — without
    # it the doc-grain groupBy(id) is exchange-free BY LUCK of the fixture
    # and the single-exchange assertion below would pass vacuously
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox number "),
                F.col("id").cast("string"),
                F.lit(" jumps over the lazy dog "),
                (F.col("id") % 7).cast("string"),
            ).alias("text"),
        )
        .repartition(5)
    )


def test_language_id_zero_exchange(spark):
    """language_id is ONE row-local projection (PERF.md §11): no Exchange,
    no Generate (the old shape exploded the corpus-sized token stream and
    shuffled it by (doc, lang))."""
    from graph_computing_go_spark.operators.text import language_id

    plan = _plan(language_id(_docs(spark)))
    # the fixture's round-robin repartition is the only exchange allowed
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Generate" not in plan, plan


def test_simhash_zero_exchange(spark):
    """simhash is one aggregate over the row-local token-hash array
    (PERF.md §12): no Exchange, no Generate."""
    from graph_computing_go_spark.operators.dedup import simhash

    plan = _plan(simhash(_docs(spark)))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Generate" not in plan, plan


def test_repetition_score_zero_exchange(spark):
    """repetition_score is one row-local projection like quality_cols
    (registered driver query as of r5): no Exchange, no Generate."""
    from graph_computing_go_spark.operators.text import repetition_score

    plan = _plan(repetition_score(_docs(spark)))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Generate" not in plan, plan


def test_stream_prep_single_stateful_projection(spark, tmp_path):
    """prepare_corpus_stream's gate stage is ONE stateless projection: the
    analyzed plan contains exactly one stateful operator (the watermark
    dedup) and NO aggregate/join/repartition — the property that lets the
    gates run on a stream at all (streaming/pipeline.py docstring)."""
    from graph_computing_go_spark.streaming import prepare_corpus_stream

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "2024-01-01")],
        "doc_id long, text string, ts string",
    ).write.parquet(src)
    stream = prepare_corpus_stream(
        spark, src, watermark="10 minutes", max_dup_line_frac=0.9
    )
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert plan.count("DeduplicateWithinWatermark") == 1, plan
    for bad in ("Aggregate", "Join", "Repartition"):
        assert bad not in plan, plan


def test_subject_lifecycle_no_year_fanned_edge_exchange(spark):
    """PERF.md §16: the subject lifecycle must never shuffle a YEAR-FANNED
    edge table — edges are tagged once with ymax and only vertex/subject
    grain increments fan across the year list.  Pin: no Exchange whose key
    set contains `year` together with an edge endpoint column (the old
    shape repartitioned the |E|×years table on (year, dst))."""
    from graph_computing_go_spark.plans.subjects import subject_entropy_lifecycle

    verts = spark.createDataFrame(
        [(1, 2000, ["a"]), (2, 2000, ["a"]), (3, 2001, ["b"])],
        "id long, year int, subjects array<string>",
    ).repartition(3)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 2)], "src long, dst long"
    ).repartition(3)
    out = subject_entropy_lifecycle(verts, edges, years=[2000, 2001])
    plan = _plan(out)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "year" in ln:
            assert "src" not in ln and "dst" not in ln, ln


def test_lsh_band_table_single_doc_grain_exchange(spark):
    """Fused banding (PERF.md §12): the n_hashes minima come out of ONE
    groupBy(id) — exactly one hash exchange, keyed on the doc id, never on
    the shingle."""
    from graph_computing_go_spark.operators.dedup import lsh_band_table, shingle_rows

    plan = _plan(lsh_band_table(shingle_rows(_docs(spark))))
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, plan
    assert "id" in exchanges[0] and "shingle" not in exchanges[0], plan


def test_minhash_candidates_no_shingle_grain_exchange(spark):
    """The candidate path's surviving exchanges are doc-, band-, and
    pair-grain only (PERF.md §10/§12): no Exchange keyed on the shingle
    column anywhere in the plan."""
    from graph_computing_go_spark.operators.dedup import minhash_lsh_candidates

    plan = _plan(minhash_lsh_candidates(_docs(spark), chunk=64))
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "shingle" not in ln, ln


def test_single_scan_expansions_have_no_union(spark):
    """The round-4 explode rewrites (PERF.md §15): corner/endpoint
    expansion must be a Generate over ONE scan, never a Union re-executing
    the source subtree per column."""
    from graph_computing_go_spark.plans.components import symmetrize
    from graph_computing_go_spark.plans.pagerank import vertices_of
    from graph_computing_go_spark.plans.triangles import triangles_per_vertex

    edges = spark.range(300).select(
        (F.col("id") % 37).alias("src"), (F.col("id") % 23 + 1).alias("dst")
    ).repartition(4)
    for df in (
        symmetrize(edges, dedup=False),
        vertices_of(edges),
        triangles_per_vertex(edges),
    ):
        plan = _plan(df)
        assert "Union" not in plan, plan
        assert "Generate" in plan, plan


def test_grouped_distance_tag_joins_reuse_nc_partitioning(spark, monkeypatch):
    """The node_cat cache is pre-partitioned on hash(group…, id) and probed
    by BOTH tag joins through alias-aware output partitioning (PERF.md §13)
    — its cached layout must carry a user-specified repartition on those
    keys.  Checked on the lazy plan (SPARK_GRAFT_EAGER=0) so the audit sees
    the full tree, same as tools/plandump.py."""
    monkeypatch.setenv("SPARK_GRAFT_EAGER", "0")
    from graph_computing_go_spark.functions.distance_complexity import (
        distance_complexity,
    )

    w = spark.createDataFrame(
        [(9, 2, 1, 1.0), (9, 3, 1, 2.0), (9, 3, 2, 1.0)],
        "g int, a long, b long, distance double",
    )
    c = spark.createDataFrame(
        [(9, 1, ["x"]), (9, 2, ["x", "y"]), (9, 3, ["y"])],
        "g int, id long, cats array<string>",
    )
    out = distance_complexity(w, c, group=["g"], assume_canonical=True)
    plan = _plan(out)
    # the canonical-skip must hold: no dropDuplicates-style aggregate on
    # (g, a, b) reintroduced upstream of the edge cache
    assert "REPARTITION_BY_NUM" in plan or "hashpartitioning(g" in plan, plan
    row = out.collect()[0]
    assert round(row["big"], 9) == round(1.0754887502163468, 9)
    # lazy mode (EAGER=0) skips the function's own unpersist hygiene, so its
    # four internal caches would outlive this test in the shared session —
    # drop them here (ADVICE r4)
    spark.catalog.clearCache()
