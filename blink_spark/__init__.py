"""blink_spark — a from-scratch PySpark-native record-linkage / entity-resolution engine.

Re-expresses the capabilities of the reference two-stage retrieve-then-rank
entity linker (yc-song/BLINK, see SURVEY.md) as an idiomatic Spark pipeline:

  stage 1  blocking            MinHash-LSH over token shingles + SimHash
                               embedding buckets (the bi-encoder / FAISS /
                               BM25 candidate-generation analog,
                               reference: blink/indexer/faiss_indexer.py,
                               blink/main_solr.py)
  stage 2  pairwise scoring    batched Jaro-Winkler + Levenshtein-ratio +
                               cosine-over-hashed-embeddings in vectorized
                               pandas/Arrow UDFs (the cross-encoder / MLP
                               reranker analog, reference:
                               blink/crossencoder/crossencoder.py,
                               blink/crossencoder/mlp.py)
  stage 3  clustering          large-star / small-star iterative
                               connected components over the match-edge
                               DataFrame (the argmax entity-assignment
                               analog, reference: blink/main_dense.py:541-586)

All heavy compute is vectorized (numpy over Arrow batches); no per-row
Python in the hot path. Every stage checkpoints through
:mod:`blink_spark.checkpoint` so runs resume mid-pipeline with
per-partition lineage counters.
"""

from blink_spark.session import get_spark  # noqa: F401
from blink_spark.pipeline import ERPipeline, PipelineConfig  # noqa: F401

__version__ = "0.1.0"
