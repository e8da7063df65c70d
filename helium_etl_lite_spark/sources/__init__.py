"""Sources: block/txn feeds for the ingest pipeline (SURVEY §2.1 E1-E3)."""
