"""Relational operators of the engine (SURVEY.md §2).

- ``graph``: edge-table derivation, subgraph induction, rank slices, dedup.
- ``dedup``: document deduplication family (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine).
- ``similarity``: approximate-nearest-neighbor search over embeddings.
- ``text``: language-ID, quality scoring, token counting, fingerprinting.
- ``multimodal``: binary-column plumbing for image/audio payloads.
"""
