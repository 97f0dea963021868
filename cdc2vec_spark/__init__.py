"""cdc2vec_spark — a PySpark-native analytics engine with the query and
data-processing surface of the reference `cdc2vec` pipeline
(/root/reference, Go), re-expressed Spark-first.

Layout:
  session.py   SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
  config.py    Mapping / engine config dataclasses (≅ internal/config/config.go:61-66)
  io.py        fixture table loaders + temp-view registration
  cdc/         change-envelope model, transforms, changelog fixture, CDC apply
  embed/       embedding providers (deterministic hash provider + HTTP, gated)
  vector/      L2 normalize, dot/cosine, exact top-k
  operators/   dedup (exact/minhash/simhash/ngram), similarity search,
               text analysis, multimodal binary plumbing
  streaming/   structured-streaming sources, window helpers, CDC stream apply
  sinks/       collection (keyed parquet upsert), kafka message schema,
               qdrant parity helpers (FNV-1a id)

Design stance (SURVEY.md §7): DataFrame/SQL everywhere, Catalyst does the
optimizing, pandas_udf only where built-ins can't express the semantics,
every operator partition-parallel so the same code runs at 100 TB.
"""

__version__ = "0.1.0"
