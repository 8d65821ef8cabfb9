"""DataFrame operator library — the Streams-DSL / KSQL surface re-expressed.

Each module maps a block of SURVEY.md §2's operator inventory to declarative
DataFrame transformations so Catalyst owns the physical plan:

- ``projections``  — P1-P6 (flatMapValues/map/selectKey/struct access)
- ``joins``        — J1-J6 (windowed stream-stream joins, dim joins)
- ``aggregations`` — A1-A4 + windowed aggregation (ST7)
- ``dedup``        — exact / MinHash-LSH / SimHash / n-gram Jaccard near-dup
- ``similarity``   — embedding cosine top-k (brute force + LSH-bucketed)
- ``text``         — language-ID, quality scoring, token counts, fingerprints
- ``multimodal``   — binary payload columns + Arrow-batched decode plumbing
- ``frequency``    — Misra-Gries exact heavy hitters, count-min sketch, KMV
- ``graph``        — co-occurrence edges + degree-oriented triangle census
- ``layout``       — Z-order clustering keys, distributive skyline
- ``membership``   — Bloom-filter semi-join with fp accounting
- ``indexing``     — blocked delta-encoded inverted index
- ``bpe``          — BPE tokenizer training (unrollable merge rounds)
"""
