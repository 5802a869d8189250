"""Ray Data stages: callable classes for actor pools, functions for stateless tasks.

Every stage is ``pa.Table -> pa.Table`` (or pandas where the kernel needs it)
for use with ``Dataset.map_batches``. Stage state (compiled regexes, parser
caches, sketch hash families, broadcast lookups) lives in ``__init__`` —
once per actor, amortized across batches (SURVEY.md §2.3).
"""
