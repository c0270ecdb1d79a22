"""globalign_spark — a PySpark-native entity-resolution / record-linkage engine.

Re-expresses the query semantics of the reference aligner
(``iamgiddyaboutgit/globalign``, read-only at /root/reference) as a
distributed blocking -> pairwise-alignment-scoring -> transitive-clustering
pipeline, plus the text-dedup / similarity / quality operators a web-scale
training-data pipeline needs.

Layout
------
kernel.py     pure numpy Gotoh (affine-gap Needleman-Wunsch) kernel, cost-space
matrices.py   scoring/costing matrices + exact score<->cost transforms
config.py     parameter dataclasses mirroring the reference defaults
api.py        reference-compatible single-pair API (find_global_alignment)
operators/    blocking, scoring (pandas UDF), clustering, dedup, similarity
sources/      fixture synthesis (pages), FASTA reader, testdata loaders
functions/    text analysis column functions (lang id, quality, fingerprints)
plans/        stage orchestrator with checkpoint/resume + lineage
streaming/    structured-streaming ingest of pages
"""

__version__ = "0.1.0"
