"""data_text_search_spark — a from-scratch PySpark-native full-text engine.

Re-expresses the query semantics of the reference app
``seanpedrick-case/data_text_search`` (a single-process pandas/rank-BM25
Gradio app) as a distributed Spark engine:

- deterministic clean/tokenize normalization (vectorized, Arrow-batched)
- distributed inverted-index build: term-partitioned, docID-sorted,
  delta-gap + varint block-compressed posting lists with per-block
  max-score metadata, built via salted repartition+sort to defeat
  hot-term skew, persisted with per-partition lineage manifests for
  checkpoint-resumable rebuilds
- BM25 top-k query execution (k1=1.5, b=0.75, unsmoothed Robertson IDF,
  alpha cutoff) both as a pure-DataFrame exhaustive scorer and as a
  block-max-WAND executor over the physical index
- secondary paths from the reference: fuzzy (Levenshtein) search,
  semantic (cosine) search over an embeddings table, user join-tables
- large-scale training-data-pipeline operators: dedup (exact / MinHash-LSH
  / SimHash / n-gram Jaccard), similarity search, language-ID, quality
  scoring, token counting, document fingerprinting

Everything is DataFrame-first: Catalyst plans the physical execution;
Python appears only inside Arrow-vectorized pandas UDFs.
"""

from data_text_search_spark.config import BM25Config

__all__ = ["BM25Config"]
__version__ = "0.1.0"
