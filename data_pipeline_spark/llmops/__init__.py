"""LLM-data-pipeline operators (the north-star extensions, BASELINE.json).

Not reference behavior — these are the operations a 100 TB training-data
pipeline needs, built from the same Spark primitives as the rest of the
engine: text statistics / quality / language-ID / fingerprinting,
exact + fuzzy dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding
similarity search, and multimodal binary-column plumbing.

Design rules:
- everything hot stays in JVM column expressions (no Python row path);
- all hash families are md5-derived so any SQL engine reproduces them
  bit-for-bit (the correctness oracle relies on this);
- similarity math is quantized to 1e-6 fixed point so dot products
  accumulate in exact integer arithmetic — deterministic at any
  parallelism, reproducible across engines.
"""

from data_pipeline_spark.llmops import (  # noqa: F401
    classify,
    dedup,
    flac,
    multimodal,
    pq,
    similarity,
    sketches,
    textstats,
)
