"""Streaming corpus preparation — the incremental twin of
``operators.pipeline.prepare_training_corpus``.

A training feed is append-only; the batch pipeline's gates (quality
score, optional repetition, language ID) are row-local column expressions
(``operators.text.quality_cols`` / ``repetition_cols`` / ``language_cols``
— ``language_id`` is deliberately shuffle-free array arithmetic over
compile-time stopword literals), so they apply to a stream in ONE
stateless projection.  The
dedup stage is the streaming exact dedup (``dropDuplicatesWithinWatermark``
— one state row per content hash, evicted by the watermark, so state is
bounded by dedup-horizon × arrival-rate, not corpus size).

Contract vs the batch operator (pinned by test):

- Gate semantics identical, including null-safety: NULL text fails the
  quality gate (coalesced predicate), the language gate compares the same
  ``pred_lang``.
- Dedup is EXACT-content only.  Near-dup (MinHash/LSH) clustering needs
  candidate self-joins over the full corpus — unbounded state on a stream —
  so at 100 TB the standard design is exactly this split: the stream
  admits first-seen content incrementally and a periodic BATCH compaction
  (``operators.dedup.dedup_clusters``) sweeps near-duplicates from the
  accumulated kept set.  On a corpus whose only duplicates are exact, the
  two paths admit the same content hash-set; batch keeps min-id
  representatives, the stream keeps first-seen arrivals.
- Dropped rows are dropped silently (an append-mode stream cannot emit a
  ledger row for input a stateful operator swallowed); the batch ledger
  remains the audit tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_computing_go_spark.operators.text import (
    language_cols,
    quality_cols,
    repetition_cols,
    tokens_col,
)


def prepare_corpus_stream(
    spark: SparkSession,
    source_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    min_quality: float = 0.35,
    languages: tuple[str, ...] | None = ("en",),
    max_dup_line_frac: float | None = None,
    watermark: str = "1 hour",
    schema=None,
) -> DataFrame:
    """readStream over a parquet directory → first-seen kept documents
    ``(hash, id, ts, score, pred_lang)``.  Rows failing a gate, or
    duplicating already-admitted content within the watermark horizon, are
    dropped.  ``languages=None`` disables the language gate;
    ``max_dup_line_frac`` enables the repetition gate (row-local like the
    others, so it streams in the same stateless projection — NULL signal
    passes, mirroring the batch operator exactly)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)

    # gate columns in one stateless projection; the token array is
    # materialized first (child projection) because Catalyst does not CSE
    # into the HOF lambdas language_cols builds on it
    toks = F.transform(tokens_col(text_col), lambda t: F.lower(t))
    base = stream.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        quality_cols(text_col)["score"].alias("score"),
        toks.alias("__toks"),
    )
    pred, _ = language_cols("__toks")
    gated = base.withColumn("pred_lang", pred).drop("__toks")

    quality_ok = F.coalesce(F.col("score") >= min_quality, F.lit(False))
    rep_ok = (
        F.coalesce(
            repetition_cols("text")["dup_line_frac"] <= max_dup_line_frac,
            F.lit(True),
        )
        if max_dup_line_frac is not None
        else F.lit(True)
    )
    lang_ok = (
        F.coalesce(F.col("pred_lang").isin(*languages), F.lit(False))
        if languages
        else F.lit(True)
    )
    admitted = gated.filter(quality_ok & rep_ok & lang_ok).select(
        F.sha2("text", 256).alias("hash"),
        "id",
        "ts",
        "score",
        "pred_lang",
    )
    return admitted.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["hash"]
    )
