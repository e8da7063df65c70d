"""Reference-pipeline parity (SURVEY §2.1 E1-E22): incremental block
ingest with the reference's exact transform semantics, re-expressed as
declarative Spark dataflow."""
