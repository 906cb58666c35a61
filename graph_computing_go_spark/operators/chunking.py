"""Document chunking and sequence packing — the last mile from a curated
corpus to training examples (task mandate: operations a large-scale
training-data pipeline needs).

- ``chunk_documents``: split each document into overlapping token windows of
  at most ``max_tokens`` — ROW-LOCAL array expressions (the shingle pattern
  from operators/dedup.py at window grain), so the corpus-sized token stream
  never shuffles; the only row growth is the docs→chunks fan-out.
- ``pack_sequences``: greedy next-fit packing of documents into bins of at
  most ``target_tokens`` total — the standard sequence-packing step that
  turns ragged documents into dense fixed-budget training examples.
  Packing is inherently order-dependent, so the operator makes the order
  DETERMINISTIC: documents are routed to ``n_shards`` shards by a portable
  polynomial hash of their id, sorted by id within each shard, and packed
  next-fit inside an Arrow-batched kernel.  Same input → same packs under
  ANY cluster partitioning, and each shard packs independently (no global
  sequential pass — the 100 TB shape; density loss vs a global first-fit-
  decreasing is the documented trade).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_computing_go_spark.operators.text import tokens_col


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): token windows of at most
    ``max_tokens``, consecutive windows sharing ``overlap`` tokens.  Every
    non-NULL document yields at least one chunk (short docs → one chunk of
    themselves); NULL text yields no row (the corpus pipeline's gates
    already ledger those)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    # token array materialized in a child projection under the Generate —
    # Catalyst does not CSE into HOF lambdas (same trap as shingles)
    toked = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("__toks")
    ).filter(F.col("__toks").isNotNull())
    toks = F.col("__toks")
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - max_tokens, 0) / step)
    n_win = F.lit(1) + F.ceil(
        F.greatest(n - max_tokens, F.lit(0)) / F.lit(step)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda w: F.concat_ws(" ", F.slice(toks, w * step + 1, max_tokens)),
    )
    return toked.select(
        "id", F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).withColumn("n_tokens", F.size(tokens_col("chunk_text")))


def _portable_hash(col):
    """31-base polynomial rolling hash mod 2^31-1 over the id's string form
    — engine-portable (same family as operators/text.fingerprint), so shard
    routing is reproducible anywhere, unlike xxhash64."""
    codes = F.transform(
        F.split(col.cast("string"), ""), lambda c: F.ascii(c).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(2147483647),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    target_tokens: int = 2048,
    n_shards: int = 256,
) -> DataFrame:
    """(pack_id, id, n_tokens): every input row assigned to exactly one
    pack; a pack's total tokens never exceed ``target_tokens`` unless a
    single oversized document forms its own pack.

    ``pack_id`` = shard * 2^33 + ordinal-within-shard (collision-free for
    any realistic shard count).  Deterministic under any input
    partitioning: shard = portable_hash(id) % n_shards, docs packed in
    ascending id order within the shard.  Requires integer ids (the output
    schema is ``id long``); shard routing itself is type-generic.

    Sizing ``n_shards``: it is BOTH the parallelism bound (one sequential
    packing task per shard) and part of the pack identity — the same value
    must be used on re-runs for identical packs.  The default 256 suits
    the sandbox; at 100 TB pick n_shards so a shard holds ~1-4 GB of rows
    (e.g. 50k-100k shards) and record it with the dataset."""
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    import pandas as pd

    routed = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(n_tokens_col).cast("long").alias("n_tokens"),
            (_portable_hash(F.col(id_col)) % n_shards).cast("int").alias(
                "__shard"
            ),
        )
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "id")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # state spans batches WITHIN a partition: mapInPandas feeds one
        # partition's batches to one kernel instance in order, so next-fit
        # carries (shard, ordinal, fill) across batch boundaries
        cur_shard, ordinal, fill = None, -1, 0
        for pdf in batches:
            out_pack = []
            for shard, n in zip(pdf["__shard"], pdf["n_tokens"]):
                n = int(n)
                if shard != cur_shard:
                    cur_shard, ordinal, fill = shard, 0, n
                elif fill + n > target_tokens and fill > 0:
                    ordinal, fill = ordinal + 1, n
                else:
                    fill += n
                out_pack.append((int(shard) << 33) | ordinal)
            res = pdf[["id", "n_tokens"]].copy()
            res.insert(0, "pack_id", out_pack)
            yield res

    return routed.mapInPandas(
        kernel, "pack_id long, id long, n_tokens long"
    )
