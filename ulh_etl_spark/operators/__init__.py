"""DataFrame-level operators: deduplication, similarity search,
incremental state, merge — the engine's composite operations built
from Catalyst primitives (no Python in the row path unless a Pandas
UDF is explicitly the right tool).
"""
