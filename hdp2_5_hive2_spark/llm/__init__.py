"""LLM-training-data pipeline operators (beyond the Hive reference surface).

Modules:
  - text: tokenization, quality scoring, language ID, fingerprinting, n-grams
  - dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard
  - similarity: embedding cosine top-k (brute force + LSH-bucketed)
  - multimodal: binary-column plumbing with stubbed decoders

All operators are DataFrame→DataFrame transforms built from JVM-side
expressions (no Python row loops); where Python is unavoidable the batch path
is Arrow-vectorized (mapInPandas). Each is designed for 100 TB: shuffles are
on salted/banded keys, candidate generation is sub-quadratic, and the only
cross-joins are against broadcast-sized query sets.
"""
