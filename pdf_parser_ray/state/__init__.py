"""Durable run state: checkpoint manifest with per-partition lineage + metrics."""
