"""Operator library: relational core, dedup, similarity, text analysis,
multimodal plumbing. Each module exposes

  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[str, str]   # DuckDB-dialect equivalents (driver contract)

aggregated by the repo-root ``__spark_entry__.py``.
"""
