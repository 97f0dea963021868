"""Data selection via importance resampling — DSIR (Xie et al. 2023,
arXiv:2302.03169), the hashed-n-gram form.

Every large pretraining corpus is filtered toward a target domain by
scoring raw documents with the log-likelihood ratio of two bag-of-
hashed-n-gram models (target vs raw) and keeping the high scorers.
The reference engine has nothing like it (SURVEY §2.1); this is part of
the LLM-data-pipeline extension surface (SURVEY §2.2 group D).

Spark-first, sized for 100 TB of raw text:

- term generation (lowercased unigrams + bigrams) and bucket hashing
  are pure JVM expressions evaluated in the scan stage;
- the two n-gram models are bucket-count aggregates — ``n_buckets``
  rows each (hundreds, not millions), so the fitted log-ratio table is
  **broadcast** and per-doc scoring is a map-side hash join + one
  aggregate shuffle on doc id;
- log-ratios are fixed-point integers (micro-nats, ``round(·×1e6)``),
  so the per-doc sum is exact integer arithmetic — order-independent
  across partitions, engines, and retries. Floating accumulation would
  make the score depend on partitioning; a training-data pipeline that
  selects different documents per run is broken.

The bucket hash is md5-based (first 8 hex chars as an integer) rather
than xxhash64 precisely so the whole operator is portable SQL — the
exact DuckDB oracle is pinned in tests/test_selection.py at two scale
factors; the graded row rides inside x1_rowsonly_pipeline (50-entry
registry budget, SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, rebalance

_N_BUCKETS = 512
_SCALE = 1_000_000  # micro-nats per log-ratio unit


def hashed_bucket(col: Column, n_buckets: int = _N_BUCKETS) -> Column:
    """Portable term→bucket hash: first 32 bits of md5 mod n_buckets.
    (xxhash64 would be cheaper JVM-side but has no DuckDB counterpart;
    selection must be auditable against the oracle.)"""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def terms(text_col: Column) -> Column:
    """Lowercased whitespace unigrams + bigrams, as one array.

    The token array is bound once per row via a single-element
    ``transform`` lambda (the gram_strings discipline, decontam.py:47):
    a raw split referenced inside the bigram lambda would re-split the
    whole text per element — O(tokens²) per document."""

    def _terms(toks: Column) -> Column:
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(toks, bigrams)

    return F.transform(F.array(F.split(F.lower(text_col), " ")), _terms)[0]


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = _N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc DSIR importance weight against the ``is_target`` slice.

    Returns ``(id_col, n_terms, weight_micro, selected)``: weight_micro
    is the summed log-likelihood ratio in micro-nats (add-1-smoothed
    hashed-bigram models, target vs whole corpus); ``selected`` keeps
    docs that look more target-like than average (weight > 0). The
    production pattern fits the model tables on samples and reuses them
    across the corpus; here both fit and score run on the same input so
    the whole operator is one deterministic query.
    """
    bt = docs.select(
        F.col(id_col), is_target.alias("_t"), F.explode(terms(F.col(text_col))).alias("term")
    ).select(id_col, "_t", hashed_bucket(F.col("term"), n_buckets).alias("b"))
    # three downstream jobs consume bt (model counts, totals, scoring
    # join) — materialize the explode+hash pipeline ONCE instead of
    # re-running the interpreted bigram lambda per job (with d13's
    # single-split rebalance: 8.5s → 1.6s at sf0.1). localCheckpoint,
    # not persist: each call builds a fresh plan, so a bare persist
    # would leak a new cache entry per invocation. Rows are 3 small
    # ints — far smaller than the corpus.
    bt = bt.localCheckpoint(eager=True)
    raw = bt.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.count(F.when(F.col("_t"), 1)).alias("tc"),
    )
    tot = bt.agg(
        F.count(F.when(F.col("_t"), 1)).alias("T"), F.count(F.lit(1)).alias("R")
    )
    d = float(n_buckets)
    table = raw.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("tc") + 1.0) / (F.col("T") + d))
                - F.log((F.col("rc") + 1.0) / (F.col("R") + d))
            )
            * _SCALE
        )
        .cast("long")
        .alias("lw"),
    )
    return (
        bt.join(F.broadcast(table), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("lw").alias("weight_micro"),
        )
        .withColumn("selected", F.col("weight_micro") > 0)
        .orderBy(id_col)
    )


def d13_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entry: score every document against the English slice
    of the corpus (lang='en' is the target domain)."""
    # rebalance: single-split fixture would pin the term explode +
    # bigram lambda to one task (the t4_fingerprint lesson)
    d = rebalance(load_table(spark, sf_dir, "documents"))
    return dsir_weights(d, F.col("lang") == "en")


# DuckDB mirror — the exact oracle (same terms, same md5 bucket hash,
# same add-1 smoothing, same micro-nat fixed point). tests/test_selection.py
# runs both sides through the driver's comparator.
D13_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM documents
), terms AS (
  SELECT doc_id, lang,
         unnest(t || CASE WHEN len(t) >= 2
                          THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                          ELSE [] END) AS term
  FROM toks
), bt AS (
  SELECT doc_id, lang = 'en' AS _t,
         ('0x' || substr(md5(term), 1, 8))::BIGINT % {_N_BUCKETS} AS b
  FROM terms
), raw AS (
  SELECT b, count(*) AS rc, count(*) FILTER (_t) AS tc FROM bt GROUP BY b
), tot AS (
  SELECT count(*) FILTER (_t) AS T, count(*) AS R FROM bt
), tbl AS (
  SELECT b, CAST(round((ln((tc + 1.0) / (T + {_N_BUCKETS}))
                        - ln((rc + 1.0) / (R + {_N_BUCKETS}))) * {_SCALE}) AS BIGINT) AS lw
  FROM raw CROSS JOIN tot
)
SELECT bt.doc_id, count(*) AS n_terms, CAST(sum(lw) AS BIGINT) AS weight_micro,
       sum(lw) > 0 AS selected
FROM bt JOIN tbl USING (b)
GROUP BY bt.doc_id
ORDER BY bt.doc_id
"""

QUERIES = {"d13_dsir": d13_dsir}
# round-7 rotation: individually graded (was composite-delivered in r06)
ORACLES = {"d13_dsir": D13_ORACLE_SQL}
