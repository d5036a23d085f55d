"""Readers and writers: schema-projected TSV, parquet publish, manifest."""
