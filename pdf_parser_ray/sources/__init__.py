"""Corpus IO (Lance-or-Parquet indirection) + deterministic synthesis."""
