"""Text-analysis operators for training-data pipelines (task mandate).

All pure built-in column expressions (JVM-side, whole-stage codegen) — no
Python UDFs anywhere.  Every function is deliberately arithmetic-portable so
the DuckDB oracles can reproduce values bit-for-bit:

- tokenization: split on ``\\s+`` after trim;
- language-ID: stopword-hit ratio per candidate language, argmax with
  lexicographic tie-break (n-gram-free heuristic; a real model plugs in as a
  pandas UDF without changing the plan shape);
- quality score: affine combination of length / word-length / stopword /
  punctuation signals (the classic Gopher-style rule family, arithmetic
  form);
- fingerprint: 31-base polynomial rolling hash of the normalized text modulo
  2^31-1 (deterministic; NOT cryptographic — use sha2 for integrity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword seeds — enough for the heuristic to be
# discriminative on latin-script text; zh uses common particles.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "mit", "von", "zu"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "con", "para"),
    "zh": ("的", "了", "是", "在", "和", "有", "我", "不", "这", "他"),
}


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens) — whitespace tokenization."""
    return df.select(
        F.col(id_col), F.size(tokens_col(text_col)).alias("n_tokens")
    )


def stopword_table(spark) -> DataFrame:
    rows = [(lang, w) for lang, ws in sorted(STOPWORDS.items()) for w in ws]
    return spark.createDataFrame(rows, "cand_lang string, word string")


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pred_lang, hit_ratio) — stopword-ratio argmax.

    Plan shape: explode tokens → broadcast join the (tiny) stopword table →
    two-stage count → per-doc argmax via max_by.  The explode output is the
    only large intermediate and it never shuffles twice: the groupBy key is
    (doc, lang) then (doc).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(text_col)).alias("word"),
    ).withColumn("word", F.lower("word"))
    n_tok = words.groupBy("id").agg(F.count("*").alias("n_tokens"))
    sw = F.broadcast(stopword_table(df.sparkSession))
    hits = (
        words.join(sw, "word")
        .groupBy("id", "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    # argmax with deterministic tie-break (most hits, then smallest lang
    # code) as a hash aggregate — min of struct(-hits, lang) orders
    # lexicographically, replacing a per-doc sort window (same shuffle key,
    # no sort, partial-aggregates map-side)
    best = hits.groupBy("id").agg(
        F.min(F.struct((-F.col("hits")).alias("nh"), "cand_lang")).alias("__b")
    ).select(
        "id",
        F.col("__b.cand_lang").alias("pred_lang"),
        (-F.col("__b.nh")).alias("hits"),
    )
    return (
        n_tok.join(best, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("hit_ratio"),
        )
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, avg_word_len, alpha_ratio, score) — rule-based quality.

    score = 0.4·min(n_tokens/100, 1) + 0.3·clamp((avg_word_len-2)/5)
          + 0.3·alpha_ratio, rounded to 6.
    """
    toks = tokens_col(text_col)
    text = F.col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    avg_word_len = (n_chars - (n_tokens - 1)) / n_tokens
    clamp = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))  # noqa: E731
    score = (
        0.4 * clamp(n_tokens / F.lit(100.0))
        + 0.3 * clamp((avg_word_len - 2) / F.lit(5.0))
        + 0.3 * (alpha_chars / n_chars)
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(alpha_chars / n_chars, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("score"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp) — polynomial rolling hash mod 2^31-1 over the normalized
    text (lowercased, whitespace collapsed to single spaces)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    codes = F.transform(F.split(norm, ""), lambda c: F.ascii(c).cast("long"))
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(2147483647),
    )
    return df.select(F.col(id_col), fp.alias("fp"))
