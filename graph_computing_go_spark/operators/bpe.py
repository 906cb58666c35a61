"""Toy byte-pair-encoding tokenizer — a REAL sub-word model for the
tokenizer seam (VERDICT r4 next #5).

``text.tokenizer_udf`` ships any Python tokenizer to executors as an
Arrow-batched ``pandas_udf``; until now the seam was only exercised by a
character-slicing stub.  ``ToyBPE`` is the genuine article in miniature:
classic BPE (Sennrich et al. 2016, the public algorithm) — train learns a
merge table from word frequencies, encode greedily applies merges by rank —
kept deliberately tiny (default 50 merges) and dependency-free so tests and
benches stay deterministic and fast.

Scale shape: training is a driver-side pass over a SAMPLE (tokenizers are
trained once on a corpus sample, never distributed per-row); encoding is the
distributed hot path and is batch-vectorized — each Arrow batch deduplicates
its words and encodes each distinct word once through a bounded per-executor
cache (clear-on-full at 2^16 entries; natural-language batches repeat words
heavily, so the per-word Python cost amortizes to near zero).  The instance is a plain picklable
object: cloudpickle ships the merge table by value inside the UDF closure.

Determinism: ties in pair frequency break lexicographically, so the same
training text always yields the same merge table — and therefore the same
token counts, chunk windows, and pack boundaries downstream (the property
tests pin).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

_EOW = "</w>"  # end-of-word marker, fused into the final subword's symbol
_CACHE_CAP = 1 << 16  # per-worker encode-cache bound (clear-on-full)


class ToyBPE:
    """Frozen BPE model: ``merges`` is the ranked pair list.

    Callable with a ``pd.Series`` of texts (the ``tokenizer_udf`` contract):
    returns a Series of token lists, ``None`` text -> ``None``.
    """

    def __init__(self, merges: Iterable[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}

    # -- training ----------------------------------------------------------
    @classmethod
    def train(cls, texts: Iterable[str | None], n_merges: int = 50) -> "ToyBPE":
        """Learn ``n_merges`` merges from word frequencies (lowercased,
        whitespace words, ``</w>`` appended to the last character so
        word-final subwords are distinct symbols from word-internal ones)."""
        wf: Counter[str] = Counter()
        for t in texts:
            if t is None:
                continue
            for w in str(t).split():
                wf[w.lower()] += 1
        vocab: Counter[tuple[str, ...]] = Counter()
        for w, c in wf.items():
            seq = tuple(w[:-1]) + (w[-1] + _EOW,)
            vocab[seq] += c
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            pairs: Counter[tuple[str, str]] = Counter()
            for seq, c in vocab.items():
                for i in range(len(seq) - 1):
                    pairs[(seq[i], seq[i + 1])] += c
            if not pairs:
                break
            # deterministic: highest count, lexicographically smallest pair
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            nxt: Counter[tuple[str, ...]] = Counter()
            for seq, c in vocab.items():
                nxt[_merge_seq(seq, best)] += c
            vocab = nxt
        return cls(merges)

    # -- encoding ----------------------------------------------------------
    def encode_word(self, w: str) -> list[str]:
        """Greedy rank-order BPE encode of one (lowercased) word."""
        if not w:
            return []
        seq: list[str] = list(w[:-1]) + [w[-1] + _EOW]
        while len(seq) > 1:
            best_rank, best_pair = None, None
            for i in range(len(seq) - 1):
                r = self.ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (seq[i], seq[i + 1])
            if best_pair is None:
                break
            seq = list(_merge_seq(tuple(seq), best_pair))
        return seq

    def __call__(self, series):
        """Arrow-batch encode: ``pd.Series[str|None] -> pd.Series[list|None]``.

        Batch-level word dedup: each distinct word is encoded once per batch
        (the cache persists across calls within the executor process, so in
        practice once per executor)."""
        cache = self._cache if hasattr(self, "_cache") else {}
        self._cache = cache

        def enc(t):
            if t is None:
                return None
            out: list[str] = []
            for w in str(t).split():
                lw = w.lower()
                toks = cache.get(lw)
                if toks is None:
                    # bound the per-worker cache: distinct words grow with
                    # corpus size (ids, URLs), and Python workers are reused
                    # across batches — unbounded, this is a slow worker OOM
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    toks = cache[lw] = self.encode_word(lw)
                out.extend(toks)
            return out

        return series.map(enc)

    # pickle: ship only the merge table, never the encode cache
    def __getstate__(self):
        return {"merges": self.merges}

    def __setstate__(self, state):
        self.__init__(state["merges"])


def _merge_seq(seq: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right occurrence of ``pair``."""
    out: list[str] = []
    i, n = 0, len(seq)
    a, b = pair
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)
