"""ocr_vector_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference OCR vector-database / RAG system
(johnhuh619/ocr_vector_db), re-expressed Spark-first.

The reference is a single-node Python + Postgres/pgvector system; this package
re-implements its dataflow operators (parse, segment, unitize, chunk, validate,
hash, embed, KNN search, filter, join-to-parent, group, dedup, top-n-per-group,
rank, RAG assemble) as declarative DataFrame plans so Catalyst/Tungsten pick the
physical strategy, plus the LLM-data-pipeline operators (dedup families,
similarity search, multimodal columns, text analysis) needed at 100 TB scale.

Layout:
    session     SparkSession factory tuned for local testing / cluster defaults
    schemas     StructTypes for the entity tables (documents/concepts/fragments/
                embeddings/parents) and ingestion intermediates
    functions/  column-level functions: hashing, text normalization, chunking,
                eligibility validators, vector math, text analysis
    operators/  dataflow operators: knn/similarity search, dedup, grouping,
                context expansion, cascade delete, metrics, parent synthesis
    sources/    parsers (markdown / OCR text / PDF-stub), ingest pipeline,
                multimodal binary-column plumbing
    plans/      query plan, search pipeline, deterministic query optimizer,
                golden-query harness
    streaming/  Structured Streaming ingest (extension beyond the reference)
"""

__version__ = "0.1.0"
