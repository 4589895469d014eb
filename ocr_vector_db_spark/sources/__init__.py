"""Sources: file parsers (markdown / OCR text / PDF-stub), the distributed
ingest pipeline, and multimodal binary-column plumbing."""
