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

from graph_computing_go_spark.operators.text import tokens_expr


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
    tokenizer=None,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): token windows of at most
    ``max_tokens``, consecutive windows sharing ``overlap`` tokens.  Every
    non-NULL document yields at least one chunk (short docs → one chunk of
    themselves); NULL text yields no row (the corpus pipeline's gates
    already ledger those).

    ``tokenizer`` (see ``text.tokenizer_udf``) swaps the whitespace default
    for an Arrow-batched model tokenizer — windows, ``n_tokens``, and hence
    every downstream ``pack_sequences`` budget are then measured in ITS
    tokens.  ``chunk_text`` is the space-join of the window either way, so a
    sub-word tokenizer should emit surface forms whose space-join is an
    acceptable chunk rendering (or the caller re-detokenizes).  Determinism
    of chunks AND packs then depends on the tokenizer version — record it
    with the dataset, exactly like ``n_shards``."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    # token array materialized in a child projection under the Generate —
    # Catalyst does not CSE into HOF lambdas (same trap as shingles)
    toked = df.select(
        F.col(id_col).alias("id"), tokens_expr(text_col, tokenizer).alias("__toks")
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
    # n_tokens from window arithmetic (min(max_tokens, n - idx*step)): the
    # window IS the token list, so re-tokenizing chunk_text would be both
    # wasted work and wrong for sub-word tokenizers (space-join need not
    # round-trip); identical values on the whitespace path (tokens cannot
    # contain whitespace)
    return toked.select(
        "id",
        F.size(toks).alias("__n"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        "id",
        "chunk_idx",
        "chunk_text",
        F.least(
            F.lit(max_tokens), F.col("__n") - F.col("chunk_idx") * step
        ).cast("int").alias("n_tokens"),
    )


def _next_fit_ordinals(sizes, target: int, fill0: int = 0):
    """Exact next-fit bin ordinals for ONE shard segment — fully vectorized
    (numpy cumsum + searchsorted bin boundaries + pointer-doubling chain
    enumeration; no per-row Python loop).

    Semantics match the sequential rule: an item joins the open bin when
    ``fill + n <= target`` OR ``fill == 0`` (zero-size items never close a
    bin, so the first non-zero item always joins — even oversized; an
    oversized item then closes the bin for whatever follows).  ``fill0``
    carries the previous batch's open-bin fill, so ordinals are relative to
    that open bin.  Returns ``(ordinals int64 array, fill of the last bin)``.
    """
    import numpy as np

    sizes = np.asarray(sizes, dtype=np.int64)
    if len(sizes) == 0:
        return np.empty(0, dtype=np.int64), fill0
    sentinel = fill0 > 0
    if sentinel:
        # the open bin's current fill behaves exactly like a first item of
        # that size already sitting in bin 0
        sizes = np.concatenate([np.array([fill0], dtype=np.int64), sizes])
    n = sizes
    m = len(n)
    csum = np.cumsum(n)  # inclusive prefix sums
    base = csum - n  # exclusive prefix sums
    idx = np.arange(m, dtype=np.int64)
    # bin starting at j ends before g[j]: the first index whose inclusive
    # sum exceeds base[j] + target — but never before j+1 (a bin holds at
    # least one item) nor before the first non-zero item at/after j (fill
    # stays 0 across zero-size items, so that item joins unconditionally)
    g = np.searchsorted(csum, base + target, side="right")
    nz = np.flatnonzero(n)
    if len(nz):
        pos = np.searchsorted(nz, idx, side="left")
        firstnz = np.where(pos < len(nz), nz[np.minimum(pos, len(nz) - 1)], m - 1)
    else:
        # all-zero segment: everything stays in the open bin
        firstnz = np.full(m, m - 1, dtype=np.int64)
    g = np.maximum(np.maximum(g, idx + 1), np.minimum(firstnz + 1, m))
    # enumerate the bin-start chain 0 -> g[0] -> g[g[0]] -> ... by pointer
    # doubling: after round k, starts holds the first 2^k chain nodes and
    # jump is the 2^k-step table (index m is its fixed point).  g is
    # non-decreasing, so each gathered block is sorted and the chain is
    # complete the moment a block reaches m.  O(m log bins), all numpy.
    jump = np.append(g, m)
    starts = np.array([0], dtype=np.int64)
    while True:
        nxt = jump[starts]
        if nxt[-1] >= m:
            starts = np.concatenate([starts, nxt[nxt < m]])
            break
        starts = np.concatenate([starts, nxt])
        jump = jump[jump]
    ordinals = np.searchsorted(starts, idx, side="right") - 1
    last_fill = int(csum[-1] - base[starts[-1]])
    return (ordinals[1:] if sentinel else ordinals), last_fill


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

    ``n_tokens`` is whatever the upstream chunker counted — with a custom
    ``tokenizer`` in ``chunk_documents``/``token_count``, pack budgets are
    in THAT tokenizer's units and pack determinism additionally depends on
    the tokenizer version (record it with the dataset).

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

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # state spans batches WITHIN a partition: mapInPandas feeds one
        # partition's batches to one kernel instance in order, so next-fit
        # carries (shard, ordinal, fill) across batch boundaries.  The
        # packing itself is vectorized (_next_fit_ordinals); the only Python
        # loop is over contiguous SHARD RUNS in the batch (a handful per
        # partition), not rows.
        cur_shard, ordinal, fill = None, 0, 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"pack_id": [], "id": [], "n_tokens": []}
                ).astype({"pack_id": "int64", "id": "int64", "n_tokens": "int64"})
                continue
            shards = pdf["__shard"].to_numpy()
            sizes = pdf["n_tokens"].to_numpy(dtype=np.int64)
            pack = np.empty(len(pdf), dtype=np.int64)
            bounds = np.flatnonzero(np.diff(shards)) + 1
            edges = np.concatenate(([0], bounds, [len(pdf)]))
            for a, b in zip(edges[:-1], edges[1:]):
                s = int(shards[a])
                base, f0 = (ordinal, fill) if s == cur_shard else (0, 0)
                ords, fill = _next_fit_ordinals(
                    sizes[a:b], target_tokens, f0
                )
                ords = ords + base
                # pack_id = (shard << 33) | ordinal — an ordinal at 2^33
                # would silently corrupt the shard bits, like the sibling
                # bit-packed ids (chunk doc_id, global_row_number); fail
                # loudly instead (same contract as their assert_true guards)
                if int(ords[-1]) >= 1 << 33:
                    raise ValueError(
                        f"pack_sequences: shard {s} produced ordinal "
                        f"{int(ords[-1])} >= 2^33 — pack_id bit budget "
                        "exceeded; raise n_shards"
                    )
                pack[a:b] = (s << 33) | ords
                cur_shard, ordinal = s, int(ords[-1])
            res = pdf[["id", "n_tokens"]].copy()
            res.insert(0, "pack_id", pack)
            yield res

    return routed.mapInPandas(
        kernel, "pack_id long, id long, n_tokens long"
    )
