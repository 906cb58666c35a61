"""Command-line surface mirroring the reference's cobra CLI
(/root/reference/cmd/*.go) — every subcommand the reference ships has a
Spark-first equivalent here, launched either as

    python -m graph_computing_go_spark.cli <cmd> [...]

or on a cluster as

    spark-submit --py-files gcgs.zip -m ... cli.py <cmd> [...]

(package the library with ``zip -r gcgs.zip graph_computing_go_spark``).

Reference command → subcommand map:

| reference (cmd/*.go) | here |
|---|---|
| `wikiEntropy -t total` (cmd/wikiEntropy.go:29-38) | `yearly-entropy` |
| `oae -t total` (cmd/oae.go:23-41) | `yearly-entropy` (same lifecycle, works payload) |
| `wikiSubjectEntropy` / `oae -t multilayerSubjectEntropy` (wikiSubjectEntropy.go:64-95) | `subject-entropy` |
| `oae -t degreeStats` / `wikiDegreeStats` | `degree-stats` |
| `wikipediaGoogleDistance` (cmd/wikipediaGoogleDistance.go) | `google-distance` |
| single-graph distance-complexity family | `distance-complexity` |
| `oae -t tddc` per-(year, discipline) lifecycle (openAlexTopDsiplineDistanceComplexity.go) | `tddc` |
| `wikipediaInDegree` (cmd/wikipediaInDegree.go) | `in-degree` |
| (north rule additions) | `pagerank`, `connected-components`, `label-propagation`, `triangles` |
| (training-data additions) | `dedup` (near-dup clustering over a document table), `prepare` (quality → optional repetition → language → dedup ledger) |
| `extractWikipediaDump` (ingest) | `ingest-repos` |

Inputs are parquet paths (edge table ``src,dst``; vertex tables as noted);
results are appended to ``--output <warehouse>/<table>`` via
sources/io.write_result.  Every command prints ONE summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark(args):
    from graph_computing_go_spark import get_spark

    return get_spark(app_name=f"gcgs-{args.cmd}", master=args.master)


def _edges(spark, path):
    return spark.read.parquet(path).select("src", "dst")


def _emit(**kv):
    print(json.dumps(kv))


def cmd_yearly_entropy(args):
    from graph_computing_go_spark.plans.yearly import yearly_entropy_pipeline
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    edges = _edges(spark, args.edges)
    vertices = spark.read.parquet(args.vertices).select("id", "year")
    res = yearly_entropy_pipeline(
        vertices, edges, years=args.years, percents=tuple(args.percents)
    ).cache()  # written AND counted: one execution
    write_result(res, args.output, "yearly_entropy", partition_by=("year",))
    _emit(cmd=args.cmd, rows=res.count(), output=f"{args.output}/yearly_entropy")


def cmd_subject_entropy(args):
    """Reference `wikiSubjectEntropy` / `oae -t multilayerSubjectEntropy`
    lifecycle (wikiSubjectEntropy.go:64-95,
    openAlexMultilayerSubjectEntropy.go:130-160): per-subject circle
    entropies per snapshot year, one year-threaded plan (PERF.md §14)."""
    from graph_computing_go_spark.plans.subjects import subject_entropy_lifecycle
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    edges = _edges(spark, args.edges)
    vertices = spark.read.parquet(args.vertices).select(
        "id", "year", "subjects"
    )
    res = subject_entropy_lifecycle(
        vertices, edges, years=args.years, min_in_degree=args.min_in_degree
    ).cache()  # written AND counted: one execution
    write_result(res, args.output, "subject_entropy", partition_by=("year",))
    _emit(cmd=args.cmd, rows=res.count(), output=f"{args.output}/subject_entropy")


def cmd_degree_stats(args):
    from graph_computing_go_spark.functions.entropy import (
        degree_distribution_entropy,
        degree_histogram,
        structural_entropy,
    )
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    edges = _edges(spark, args.edges)
    for kind in ("in", "out", "all"):
        write_result(
            degree_histogram(edges, kind).withColumn("kind", F.lit(kind)),
            args.output,
            "degree_histogram",
        )
    dd = degree_distribution_entropy(edges)
    dd = dd.select([F.col(c).alias(f"dd_{c}") for c in dd.columns])
    stats = structural_entropy(edges).crossJoin(dd)
    write_result(stats, args.output, "entropy_stats")
    _emit(cmd=args.cmd, output=args.output)


def cmd_google_distance(args):
    from graph_computing_go_spark.functions.ngd import google_distance
    from graph_computing_go_spark.operators.graph import rank_by_in_degree
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    edges = _edges(spark, args.edges).cache()
    ranked = rank_by_in_degree(edges)
    core = ranked.filter(F.col("rank") <= args.core_top_k).select("id")
    # both endpoints in one scan of the edge cache
    n = edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct().count()
    res = google_distance(edges, core, n).cache()
    write_result(res, args.output, "google_distance")
    _emit(cmd=args.cmd, pairs=res.count(), n_vertices=n)


def cmd_distance_complexity(args):
    from graph_computing_go_spark.functions.distance_complexity import (
        distance_complexity,
    )
    from graph_computing_go_spark.sources.io import read_weighted_tsv, write_result

    if not args.tsv and not args.wedges:
        sys.exit("distance-complexity requires --tsv or --wedges")
    spark = _spark(args)
    if args.tsv:
        w = read_weighted_tsv(spark, args.tsv)
        from graph_computing_go_spark.operators.labels import dense_string_ids

        names = w.select(
            F.explode(F.array("concept1", "concept2")).alias("key")
        )
        ids = dense_string_ids(names, "key")
        w = (
            w.join(ids.withColumnRenamed("key", "concept1"), "concept1")
            .withColumnRenamed("dense_id", "a")
            .join(ids.withColumnRenamed("key", "concept2"), "concept2")
            .withColumnRenamed("dense_id", "b")
            .select("a", "b", "distance")
        )
    else:
        w = spark.read.parquet(args.wedges).select("a", "b", "distance")
    cats = (
        spark.read.parquet(args.categories).select("id", "cats")
        if args.categories
        else None
    )
    res = distance_complexity(w, cats).cache()  # written AND printed: one run
    write_result(res, args.output, "distance_complexity")
    row = res.collect()[0]
    _emit(cmd=args.cmd, big=row["big"], little=row["little"])


def cmd_tddc(args):
    """Reference `oae -t tddc` lifecycle
    (openAlexTopDsiplineDistanceComplexity.go:44-179): weighted TSV scan
    (S7) → dense concept ids (J8) → label-intersection routing (J7) →
    grouped big/little per (year, discipline) (A6/A7) — ONE plan for every
    work key, vs the reference's goroutine-per-(year, concept) loop.

    ``--labels``: parquet (key: string, labels: array<string>) mapping
    concept names to their lv0 disciplines; an edge belongs to every
    discipline shared by its endpoints.  ``--categories``: optional parquet
    (key: string, cats: array<string>) of module labels per concept
    (lv1 titles in the reference); nodes present in a group without a
    category drop out of the little term only, like the reference's
    unknown-category warning path."""
    from graph_computing_go_spark.functions.distance_complexity import (
        distance_complexity,
    )
    from graph_computing_go_spark.operators.labels import (
        dense_string_ids,
        route_edges_by_labels,
    )
    from graph_computing_go_spark.sources.io import read_weighted_tsv, write_result

    spark = _spark(args)
    w = read_weighted_tsv(spark, args.tsv)
    # both concept columns in one scan of the TSV
    names = w.select(F.explode(F.array("concept1", "concept2")).alias("key"))
    ids = dense_string_ids(names, "key").cache()
    edges = (
        w.join(ids.withColumnRenamed("key", "concept1"), "concept1")
        .withColumnRenamed("dense_id", "src")
        .join(ids.withColumnRenamed("key", "concept2"), "concept2")
        .withColumnRenamed("dense_id", "dst")
        .select("year", "src", "dst", "distance")
    )
    labels = (
        spark.read.parquet(args.labels)
        .join(ids, "key")
        .select(F.col("dense_id").alias("id"), "labels")
    )
    routed = route_edges_by_labels(
        edges, labels, carry_cols=("year", "distance")
    )
    wedges = routed.select(
        "year",
        "discipline",
        F.greatest("src", "dst").alias("a"),
        F.least("src", "dst").alias("b"),
        "distance",
    ).cache()
    cats = None
    if args.categories:
        cmap = (
            spark.read.parquet(args.categories)
            .join(ids, "key")
            .select(F.col("dense_id").alias("id"), "cats")
        )
        present = wedges.select(
            "year", "discipline", F.explode(F.array("a", "b")).alias("id")
        ).distinct()
        cats = present.join(cmap, "id").select("year", "discipline", "id", "cats")
    res = distance_complexity(
        wedges, cats, group=["year", "discipline"]
    ).cache()
    write_result(res, args.output, "discipline_distance_complexity")
    _emit(cmd=args.cmd, groups=res.count())


def cmd_in_degree(args):
    from graph_computing_go_spark.operators.graph import current_in_degree
    from graph_computing_go_spark.sources.io import merge_result, write_result

    spark = _spark(args)
    res = current_in_degree(_edges(spark, args.edges)).cache()
    if getattr(args, "merge", False):
        # S10 upsert semantics (wikipediaInDegree.go:62-78): re-running the
        # job replaces rows by vertex id instead of duplicating them
        merge_result(res, args.output, "in_degree", keys=("id",))
    else:
        write_result(res, args.output, "in_degree")
    _emit(cmd=args.cmd, rows=res.count())


def _iterative(args, fn, table):
    from graph_computing_go_spark.plans.superstep import SuperstepRunner
    from graph_computing_go_spark.sources.io import write_result

    if args.resume and not args.checkpoint_dir:
        sys.exit("--resume requires --checkpoint-dir (nothing to resume from)")
    spark = _spark(args)
    edges = _edges(spark, args.edges)
    runner = (
        SuperstepRunner(spark, checkpoint_dir=args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )
    state, iters = fn(edges, runner=runner, resume=args.resume)
    state = state.cache()
    write_result(state, args.output, table)
    _emit(cmd=args.cmd, iterations=iters, rows=state.count())


def cmd_pagerank(args):
    from graph_computing_go_spark.plans import pagerank

    _iterative(
        args,
        lambda e, **kw: pagerank(
            e, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter,
            salt_buckets=args.salt_buckets, **kw
        ),
        "pagerank",
    )


def cmd_connected_components(args):
    from graph_computing_go_spark.plans import connected_components

    _iterative(
        args,
        lambda e, **kw: connected_components(
            e, max_iter=args.max_iter, jump=args.jump, **kw
        ),
        "connected_components",
    )


def cmd_label_propagation(args):
    from graph_computing_go_spark.plans import label_propagation

    _iterative(
        args,
        lambda e, **kw: label_propagation(e, max_iter=args.max_iter, **kw),
        "label_propagation",
    )


def cmd_prepare(args):
    from graph_computing_go_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    ledger = prepare_training_corpus(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        languages=tuple(args.languages) if args.languages else None,
        max_dup_line_frac=args.max_dup_line_frac,
        min_jaccard=args.min_jaccard,
    ).cache()
    write_result(ledger, args.output, "corpus_ledger")
    by_status = {
        r["status"]: r["n"]
        for r in ledger.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    ledger.unpersist()
    _emit(cmd=args.cmd, rows=sum(by_status.values()), **by_status)


def cmd_prepare_stream(args):
    """Incremental corpus preparation: each invocation processes files that
    arrived since the last run (availableNow trigger + checkpoint), appends
    admitted docs to the output, and exits — the cron-driven operational
    shape of `streaming.pipeline.prepare_corpus_stream`."""
    from graph_computing_go_spark.streaming import (
        prepare_corpus_stream,
        run_stream_once_to_dir,
    )

    spark = _spark(args)
    kept = run_stream_once_to_dir(
        prepare_corpus_stream(
            spark,
            args.docs,
            id_col=args.id_col,
            text_col=args.text_col,
            ts_col=args.ts_col,
            min_quality=args.min_quality,
            languages=tuple(args.languages) if args.languages else None,
            max_dup_line_frac=args.max_dup_line_frac,
            watermark=args.watermark,
        ),
        args.checkpoint,
        args.output,
    )
    _emit(cmd=args.cmd, rows_total=kept.count())


def cmd_compact(args):
    """Periodic batch compaction of a prepare-stream run: near-dup sweep
    (dedup_clusters) over the stream's accumulated kept set, full mapping
    MERGEd into <output>/corpus_compacted keyed on id — idempotent, and a
    later cycle can demote a previous survivor (see
    operators.pipeline.compact_corpus)."""
    from graph_computing_go_spark.operators.pipeline import compact_corpus

    spark = _spark(args)
    compacted = compact_corpus(
        spark.read.parquet(args.docs),
        spark.read.parquet(args.stream_out),
        args.output,
        id_col=args.id_col,
        text_col=args.text_col,
        min_jaccard=args.min_jaccard,
    ).cache()
    kept = compacted.filter("is_canonical").count()
    rows = compacted.count()
    compacted.unpersist()
    _emit(cmd=args.cmd, rows=rows, kept=kept)


def cmd_decontaminate(args):
    """Flag corpus documents overlapping an eval set; with --spans, also
    write the merged token spans for masking-grade decontamination."""
    from graph_computing_go_spark.operators.dedup import (
        contaminated_spans,
        decontaminate,
    )
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    corpus = spark.read.parquet(args.docs)
    evald = spark.read.parquet(args.eval)
    flags = decontaminate(corpus, evald, k=args.k).cache()
    write_result(flags, args.output, "decontaminate")
    n_bad = flags.filter("contaminated").count()
    n_rows = flags.count()
    flags.unpersist()
    extra = {}
    if args.spans:
        spans = contaminated_spans(corpus, evald, k=args.k)
        write_result(spans, args.output, "contaminated_spans")
        extra["spans"] = spans.count()
    _emit(cmd=args.cmd, rows=n_rows, contaminated=n_bad, **extra)


def cmd_chunk(args):
    """Chunk documents into token windows; optionally pack the chunks into
    token-budget training bins (chunk ids = doc_id * 2^20 + chunk_idx)."""
    from graph_computing_go_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    chunks = chunk_documents(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        max_tokens=args.max_tokens,
        overlap=args.overlap,
    ).cache()
    write_result(chunks, args.output, "chunks")
    n_chunks = chunks.count()
    extra = {}
    if args.pack_target:
        # Synthesized pack ids must be long arithmetic: int*int wraps
        # silently in Spark (CLAUDE.md invariant), colliding for id >= 2048.
        # chunk_idx < 2^20 is enforced loudly rather than assumed.
        packs = pack_sequences(
            chunks.select(
                (
                    F.col("id").cast("long") * F.lit(1 << 20).cast("long")
                    + F.col("chunk_idx").cast("long")
                    # assert_true is NULL on success; coalesce keeps the sum.
                    + F.coalesce(
                        F.assert_true(
                            F.col("chunk_idx") < F.lit(1 << 20),
                            F.lit(
                                "chunk_idx >= 2^20 would collide pack doc_ids"
                            ),
                        ).cast("long"),
                        F.lit(0).cast("long"),
                    )
                ).alias("doc_id"),
                "n_tokens",
            ),
            target_tokens=args.pack_target,
        ).cache()
        write_result(packs, args.output, "packs")
        extra["packs"] = packs.select("pack_id").distinct().count()
        packs.unpersist()
    chunks.unpersist()
    _emit(cmd=args.cmd, rows=n_chunks, **extra)


def cmd_dedup(args):
    from graph_computing_go_spark.operators.dedup import dedup_clusters
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    mapping = dedup_clusters(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        min_jaccard=args.min_jaccard,
        n_hashes=args.n_hashes,
        rows_per_band=args.rows_per_band,
    ).cache()
    write_result(mapping, args.output, "dedup_clusters")
    kept = mapping.filter("is_canonical").count()
    rows = mapping.count()
    mapping.unpersist()
    _emit(cmd=args.cmd, rows=rows, kept=kept)


def cmd_triangles(args):
    from graph_computing_go_spark.plans import triangles_per_vertex
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    edges = _edges(spark, args.edges)
    # one triangle enumeration: total = sum of corner counts / 3
    pv = triangles_per_vertex(edges, degree_oriented=args.degree_oriented).cache()
    write_result(pv, args.output, "triangles_per_vertex")
    total = pv.agg((F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3).cast("long")).collect()[0][0]
    _emit(cmd=args.cmd, n_triangles=total)


def cmd_ingest_repos(args):
    import os

    from graph_computing_go_spark.sources import (
        build_edge_table,
        verify_content_sha256,
    )
    from graph_computing_go_spark.sources.io import write_result

    spark = _spark(args)
    repos = spark.read.parquet(args.repos)
    # a REAL round-trip gate: persist the ingested copy, verify the
    # read-back content hashes against the source (source vs source would
    # be vacuous)
    ingested_path = os.path.join(args.output, "code_repos")
    repos.write.mode("overwrite").parquet(ingested_path)
    verified = verify_content_sha256(repos, spark.read.parquet(ingested_path))
    edges = build_edge_table(spark.read.parquet(ingested_path)).cache()
    write_result(edges, args.output, "code_edges")
    _emit(cmd=args.cmd, verified_rows=verified, edges=edges.count())


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gcgs")
    p.add_argument("--master", default=None, help="override spark master")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, edges=True):
        if edges:
            sp.add_argument("--edges", required=True)
        sp.add_argument("--output", required=True)

    sp = sub.add_parser("yearly-entropy")
    common(sp)
    sp.add_argument("--vertices", required=True)
    sp.add_argument("--years", type=int, nargs="+", required=True)
    sp.add_argument(
        "--percents", type=int, nargs="+", default=[10, 20, 40, 60, 80, 100]
    )
    sp.set_defaults(fn=cmd_yearly_entropy)

    sp = sub.add_parser("subject-entropy")
    common(sp)
    sp.add_argument("--vertices", required=True)
    sp.add_argument("--years", type=int, nargs="+", required=True)
    sp.add_argument("--min-in-degree", type=int, default=2)
    sp.set_defaults(fn=cmd_subject_entropy)

    sp = sub.add_parser("degree-stats")
    common(sp)
    sp.set_defaults(fn=cmd_degree_stats)

    sp = sub.add_parser("google-distance")
    common(sp)
    sp.add_argument("--core-top-k", type=int, default=100)
    sp.set_defaults(fn=cmd_google_distance)

    sp = sub.add_parser("distance-complexity")
    sp.add_argument("--wedges")
    sp.add_argument("--tsv")
    sp.add_argument("--categories")
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_distance_complexity)

    sp = sub.add_parser("tddc")
    sp.add_argument("--tsv", required=True)
    sp.add_argument("--labels", required=True)
    sp.add_argument("--categories")
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_tddc)

    sp = sub.add_parser("in-degree")
    common(sp)
    sp.add_argument(
        "--merge",
        action="store_true",
        help="upsert by vertex id (idempotent re-runs) instead of append",
    )
    sp.set_defaults(fn=cmd_in_degree)

    for name, fn in (
        ("pagerank", cmd_pagerank),
        ("connected-components", cmd_connected_components),
        ("label-propagation", cmd_label_propagation),
    ):
        sp = sub.add_parser(name)
        common(sp)
        sp.add_argument("--max-iter", type=int, default=100)
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--resume", action="store_true")
        if name == "pagerank":
            sp.add_argument("--alpha", type=float, default=0.85)
            sp.add_argument("--tol", type=float, default=1e-6)
            sp.add_argument("--salt-buckets", type=int, default=0)
        if name == "connected-components":
            # O(log diameter) pointer jumping — for size-bounded components
            # with unbounded diameter, NOT for giant-component link graphs
            # (PERF.md §9)
            sp.add_argument("--jump", action="store_true")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("triangles")
    common(sp)
    sp.add_argument("--degree-oriented", action="store_true")
    sp.set_defaults(fn=cmd_triangles)

    sp = sub.add_parser("dedup")
    sp.add_argument("--docs", required=True, help="parquet document table")
    sp.add_argument("--output", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--min-jaccard", type=float, default=0.8)
    sp.add_argument("--n-hashes", type=int, default=16)
    sp.add_argument("--rows-per-band", type=int, default=4)
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser("prepare")
    sp.add_argument("--docs", required=True, help="parquet document table")
    sp.add_argument("--output", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--min-quality", type=float, default=0.35)
    sp.add_argument(
        "--max-dup-line-frac",
        type=float,
        default=None,
        help="enable the repetition gate: drop docs whose duplicate-line "
        "fraction exceeds this (e.g. 0.3); off by default",
    )
    sp.add_argument(
        "--languages",
        nargs="*",
        default=["en"],
        help="kept languages; pass no values to disable the gate",
    )
    sp.add_argument("--min-jaccard", type=float, default=0.8)
    sp.set_defaults(fn=cmd_prepare)

    sp = sub.add_parser("decontaminate")
    sp.add_argument("--docs", required=True, help="parquet corpus table")
    sp.add_argument("--eval", required=True, help="parquet eval-set table")
    sp.add_argument("--output", required=True)
    sp.add_argument("--k", type=int, default=8, help="word k-gram size")
    sp.add_argument(
        "--spans",
        action="store_true",
        help="also write merged contaminated token spans (masking-grade)",
    )
    sp.set_defaults(fn=cmd_decontaminate)

    sp = sub.add_parser("chunk")
    sp.add_argument("--docs", required=True, help="parquet document table")
    sp.add_argument("--output", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--max-tokens", type=int, default=512)
    sp.add_argument("--overlap", type=int, default=0)
    sp.add_argument(
        "--pack-target",
        type=int,
        default=0,
        help="also pack chunks into bins of this many tokens (0 = off)",
    )
    sp.set_defaults(fn=cmd_chunk)

    sp = sub.add_parser("prepare-stream")
    sp.add_argument("--docs", required=True, help="parquet source directory")
    sp.add_argument("--output", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--ts-col", default="ts")
    sp.add_argument("--min-quality", type=float, default=0.35)
    sp.add_argument(
        "--max-dup-line-frac",
        type=float,
        default=None,
        help="enable the repetition gate (row-local, streams in the same "
        "stateless projection); off by default",
    )
    sp.add_argument(
        "--languages",
        nargs="*",
        default=["en"],
        help="kept languages; pass no values to disable the gate",
    )
    sp.add_argument("--watermark", default="1 hour")
    sp.set_defaults(fn=cmd_prepare_stream)

    sp = sub.add_parser("compact")
    sp.add_argument("--docs", required=True, help="parquet source feed")
    sp.add_argument(
        "--stream-out",
        required=True,
        help="prepare-stream output (the accumulated kept ledger)",
    )
    sp.add_argument("--output", required=True, help="warehouse directory")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--min-jaccard", type=float, default=0.8)
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("ingest-repos")
    sp.add_argument("--repos", required=True)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_ingest_repos)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
