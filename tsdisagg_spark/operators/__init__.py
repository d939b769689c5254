"""Large-scale data-pipeline operators: deduplication, similarity search,
text analysis, multimodal column plumbing.

These extend the engine beyond the reference's surface (SURVEY.md section
M8+): every operator is designed for the 100 TB case — built-in column
expressions (whole-stage codegen) wherever semantics allow, Arrow-batched
pandas UDFs only where they don't, and explicit skew/broadcast strategies
on every join.

Modules: ``dedup`` (exact / Jaccard / MinHash-LSH / SimHash),
``similarity`` (brute-force / LSH / IVF ANN, embedding near-dup),
``text`` (tokens, quality, lang-id, fingerprints, tf-idf, chunking),
``timeseries`` (as-of join, rolling stats, gap fill, indicator corr),
``joins`` (salted skew joins), ``graph`` (connected components),
``packing`` (sequence packing), ``sampling`` (deterministic stratified),
``multimodal`` (binary payload plumbing).
"""
