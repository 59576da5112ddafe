"""batch_processing_system_spark — a PySpark-native batch analytics engine.

A from-scratch, Spark-first re-expression of the capabilities specified by
the reference repo kshitijk4poor/Batch-Processing-system
(/root/reference/README.md — a prose "Batch Processing API Specification"):
JSONL ingest + validation, job-state tracking, result processing with
JSON-Schema contracts, and document upserts — generalized into a complete
relational/dataflow operator surface (SURVEY.md §2) plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Everything is declarative DataFrame/SQL so Catalyst + AQE pick physical
plans; Python re-enters only via Arrow-vectorized pandas UDFs where the
built-in operators genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
