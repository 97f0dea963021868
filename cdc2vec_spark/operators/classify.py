"""Linear hashed bag-of-words text classification at corpus scale —
the "apply a trained quality/toxicity classifier to every document"
stage of a pretraining pipeline (GPT-3's quality filter, Brown et al.
2020 §A; fastText-style linear models, Joulin et al. 2017). The
reference has nothing like it; SURVEY §2.2 group D extension.

Spark-first shape: the model is a HASHED weight vector — a token's
weight is derived from its hash, so applying the model is a pure
scan-stage expression chain (split → transform(token → weight) →
aggregate), no join, no shuffle, no UDF, whole-stage codegen throughout.
A real trained model ships its weights the same way (hashing trick,
Weinberger 2009): broadcast a weight array indexed by
``hash(token) % buckets`` — here the weight is derived from the hash
directly (deterministic, no fixture file) which keeps the operator
oracle-checkable without changing the plan shape. All arithmetic is
integer (milli-weights), so Spark and DuckDB agree bit-for-bit — the
same fixed-point discipline as d13's DSIR weights.

Weight rule: ``w_milli(token) = (h % 2001) − 1000`` ∈ [−1000, 1000]
with ``h`` = the first 60 bits of md5(token) (the proven cross-engine
hash: Spark ``conv(substr(md5(t),1,15),16,10)`` ≡ DuckDB
``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``). Document margin =
Σ w_milli over the token BAG (duplicates count — bag-of-words);
label = 'keep' iff margin > 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

_BUCKETS = 2001  # odd → weights symmetric around 0


def token_weight_milli(tok: Column) -> Column:
    """Integer milli-weight of one token from its md5-derived hash."""
    h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(_BUCKETS)) - F.lit((_BUCKETS - 1) // 2)


def classify_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_milli: int = 0,
) -> DataFrame:
    """(id, n_tok, margin_milli, label): hashed-linear margin over the
    token bag; label = 'keep' iff margin > threshold. One narrow
    scan-stage pass (HOFs only), no shuffle — at 100 TB this runs at
    I/O speed alongside the other scan-stage filters (t2/d20/d30)."""
    # NULL text scores like empty text (0 tokens, margin 0, drop) — the
    # oracle coalesces identically, so the hash can't diverge on it.
    # Tokens and margin are each materialized ONCE in their own
    # projection (round 15): the old single select evaluated the full
    # md5-per-token aggregate twice (margin_milli + the label branch)
    # and the split+filter three times per row — interpreted HOF
    # expressions have no common-subexpression cache.
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda x: x != "",
    )
    margin = F.aggregate(
        F.transform(F.col("_toks"), token_weight_milli),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            F.col(id_col),
            F.size("_toks").cast("long").alias("n_tok"),
            margin.alias("margin_milli"),
        )
        .select(
            id_col,
            "n_tok",
            "margin_milli",
            F.when(F.col("margin_milli") > threshold_milli, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def d36_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D36 (added round 9) — hashed-linear quality classification of the
    documents table: per-doc token count, integer margin, keep/drop
    label, plus stable ordering for the hash check."""
    d = load_table(spark, sf_dir, "documents")
    return classify_documents(d).orderBy("doc_id")


D36_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tok,
       CAST(coalesce(list_sum(list_transform(toks, t ->
            CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {_BUCKETS}
            - {(_BUCKETS - 1) // 2})), 0) AS BIGINT) AS margin_milli,
       CASE WHEN coalesce(list_sum(list_transform(toks, t ->
            CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {_BUCKETS}
            - {(_BUCKETS - 1) // 2})), 0) > 0
            THEN 'keep' ELSE 'drop' END AS label
FROM tok ORDER BY doc_id
"""

# round-9 addition: composite-delivered (x2), exact oracle pinned at two
# SFs in tests/test_classify.py; rotation candidate for round 10
QUERIES = {"d36_quality_classifier": d36_quality_classifier}
ORACLES = {"d36_quality_classifier": D36_ORACLE_SQL}
