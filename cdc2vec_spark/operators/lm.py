"""N-gram language-model perplexity filtering — the CCNet recipe
(Wenzek et al. 2020, arXiv:1911.00359; KenLM: Heafield 2011).

CCNet's core quality filter scores every crawled document with the
perplexity of a language model trained on a trusted reference corpus
(Wikipedia) and keeps the low-perplexity head/middle terciles. The
reference engine has nothing like it (SURVEY §2.1); this completes the
classic corpus-filtering trio next to DSIR (selection.py, discriminative
importance weights) and the Gopher repetition rules (text.py) — LM
perplexity is the generative-model member of that family.

The model here is a hashed-bigram LM with add-1 smoothing, trained on a
reference slice of the same corpus (the production pattern fits it on a
trusted corpus once and reuses the tables):

    P(w | ctx) = (count(ctx_b, w_b) + 1) / (count(ctx_b) + V)

with term→bucket hashing exactly like DSIR (md5 first-32-bits, portable
SQL, so the whole operator is auditable against a DuckDB oracle) and
V = n_buckets word buckets.

Spark-first, sized for 100 TB of raw text:

- tokenize + bigram bucket pairs are pure JVM expressions in the scan
  stage (`transform` over a `sequence`, no Python);
- the LM tables are bounded by construction — ≤ n_buckets² pair rows
  and ≤ n_buckets context rows (tens of KB) — so both are **broadcast**
  and scoring is a map-side join;
- per-bigram negative log-likelihoods are fixed-point integers
  (micro-nats), so the per-doc sum is exact integer arithmetic —
  order-independent across partitions, engines, and retries (the DSIR
  lesson: floating accumulation makes the kept set depend on
  partitioning);
- the head/middle/tail tercile cutoffs are TWO interpolated order
  statistics (`percentile`, proven bit-equal to DuckDB's quantile_cont
  by t6), computed in one aggregate and broadcast back — NOT an
  `ntile() OVER (ORDER BY …)` global window, which would funnel every
  row through one task at 100 TB.

Exact DuckDB oracle pinned at two SFs in tests/test_lm.py via the
driver's comparator; the graded row rides inside a composite probe
(50-entry registry budget, SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, rebalance
from .selection import hashed_bucket

_N_BUCKETS = 256
_SCALE = 1_000_000  # micro-nats per log-likelihood unit


def lm_perplexity(
    docs: DataFrame,
    is_reference: Column,
    n_buckets: int = _N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    pin: bool = True,
) -> DataFrame:
    """Score every document with the NLL of a hashed-bigram LM trained
    on the ``is_reference`` slice, and bucket the corpus CCNet-style.

    Returns ``(id_col, n_bigrams, nll_micro, mean_nll_micro,
    ppl_bucket, keep)``: nll_micro is the summed per-bigram negative
    log-likelihood in micro-nats (exact integer), mean_nll_micro its
    integer mean per bigram (NULL for docs with < 2 tokens),
    ppl_bucket the CCNet tercile ('head' = most reference-like /
    'middle' / 'tail', 'short' for un-scoreable docs), keep = not tail
    (CCNet discards the tail by default and keeps short docs for
    downstream length filters to judge)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    # hash every token ONCE per row (round 15, guide §2.3/§4.2): the
    # per-bigram form md5-hashed each interior token TWICE (once as the
    # context of bigram i, once as the word of bigram i-1). Binding the
    # hashed array first halves the md5 work; md5 of the same token is
    # the same value, so the (cb, wb) stream — and the oracle fixed
    # point — are bit-identical. int, not long: buckets are < n_buckets,
    # so the narrower key halves the exploded rows' shuffle bytes.
    ht = F.transform(toks, lambda tok: hashed_bucket(tok, n_buckets).cast("int"))
    base = docs.select(F.col(id_col), is_reference.alias("_r"), ht.alias("h"))
    # bigram (context-bucket, word-bucket) pairs, built JVM-side in the
    # scan stage; docs with < 2 tokens contribute no rows here and are
    # re-attached by the left join below
    bg = (
        base.where(F.size("h") >= 2)
        .select(
            id_col,
            "_r",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("h") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("h"), i).alias("cb"),
                        F.element_at(F.col("h"), i + 1).alias("wb"),
                    ),
                )
            ).alias("g"),
        )
        .select(id_col, "_r", F.col("g.cb").alias("cb"), F.col("g.wb").alias("wb"))
    )
    # three downstream jobs consume bg (pair counts, context counts,
    # scoring join) — materialize the tokenize+hash pipeline once
    # (d13's lesson). localCheckpoint, not persist: fresh plan per
    # call, a bare persist would leak a cache entry per invocation.
    bg = bg.localCheckpoint(eager=True)
    pairs = bg.where("_r").groupBy("cb", "wb").agg(F.count(F.lit(1)).alias("c2"))
    # pin the pair counts (≤ n_buckets² tiny rows): BOTH broadcast
    # builds below (pairs itself and the ctxs re-aggregate) otherwise
    # re-run the bg-scan + exchange + aggregate subtree once each —
    # one aggregation job instead of two (round 15, guide §5.2).
    pairs = pairs.localCheckpoint(eager=True)
    # context counts are the pair counts re-aggregated (Σ_wb c2 ≡ the
    # per-cb bigram count, exact integers) — ≤ n_buckets² rows instead
    # of a SECOND full pass + exchange over bg (round 14, guide §2.3
    # "aggregate before you shuffle")
    ctxs = pairs.groupBy("cb").agg(F.sum("c2").alias("c1"))
    v = float(n_buckets)
    # per-bigram NLL in micro-nats; unseen pair → c2=0, unseen context
    # → c1=0, both handled by the same smoothed formula. round() runs
    # on identical integer inputs in Spark and DuckDB, so the fixed
    # point is engine-portable (the d13 precedent).
    scored = (
        bg.join(F.broadcast(pairs), ["cb", "wb"], "left")
        .join(F.broadcast(ctxs), ["cb"], "left")
        .select(
            id_col,
            F.round(
                -(
                    F.log(F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                    - F.log(F.coalesce(F.col("c1"), F.lit(0)) + v)
                )
                * _SCALE
            )
            .cast("long")
            .alias("nll"),
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("nll").alias("nll_micro"))
    )
    perdoc = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).alias("nll_micro"),
        )
        .withColumn(
            "mean_nll_micro",
            F.when(F.col("n_bigrams") > 0, F.expr("nll_micro div n_bigrams")),
        )
    )
    # perdoc feeds TWO consumers (the tercile cutoffs and the labeled
    # output); un-pinned, the whole scoring-join subtree executed twice
    # (visible as a duplicated plan branch under the cutoff aggregate).
    # One row per doc — bounded, the d13/bg discipline (round 14).
    # LAZY checkpoint (round 15, VERDICT r14 item 6): the eager pin ran
    # one extra materialization job whose fixed cost exceeded the saved
    # recompute at sf0.1 (driver 0.72×). The two consumers are strictly
    # ordered — the cutoffs broadcast builds before the final stage that
    # streams perdoc — so the broadcast job materializes the checkpoint
    # and the final stage reads the saved blocks: single evaluation, no
    # extra job, no build race (unlike the d40/d2 concurrent-stage
    # case). ``pin=False`` keeps the plan lazy for shape inspection.
    if pin:
        perdoc = perdoc.localCheckpoint(eager=False)
    # CCNet tercile cutoffs: two order statistics over one bigint per
    # doc, broadcast back as a single row (no global-sort window)
    cuts = perdoc.where("n_bigrams > 0").agg(
        F.expr(
            "percentile(mean_nll_micro, "
            "array(cast(1 as double)/3, cast(2 as double)/3))"
        ).alias("c")
    )
    bucket = (
        F.when(F.col("n_bigrams") == 0, F.lit("short"))
        .when(F.col("mean_nll_micro") <= F.col("c")[0], F.lit("head"))
        .when(F.col("mean_nll_micro") <= F.col("c")[1], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        perdoc.crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            "n_bigrams",
            "nll_micro",
            "mean_nll_micro",
            bucket.alias("ppl_bucket"),
        )
        .withColumn("keep", F.col("ppl_bucket") != "tail")
        .orderBy(id_col)
    )


def d28_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entry: train the bigram LM on the English slice
    (lang='en' is the trusted reference, as in d13) and bucket the
    whole corpus by perplexity."""
    # rebalance: single-split fixture would pin the bigram explode to
    # one task (the t4_fingerprint lesson)
    d = rebalance(load_table(spark, sf_dir, "documents"))
    return lm_perplexity(d, F.col("lang") == "en")


# DuckDB mirror — the exact oracle (same tokens, same md5 bucket hash,
# same add-1 smoothing, same micro-nat fixed point, same quantile_cont
# cutoffs). tests/test_lm.py runs both sides through the driver's
# comparator at two SFs.
D28_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM documents
), bg AS (
  SELECT doc_id, lang = 'en' AS _r,
         unnest(list_transform(range(1, len(t)),
                i -> ('0x' || substr(md5(t[i]), 1, 8))::BIGINT % {_N_BUCKETS})) AS cb,
         unnest(list_transform(range(1, len(t)),
                i -> ('0x' || substr(md5(t[i+1]), 1, 8))::BIGINT % {_N_BUCKETS})) AS wb
  FROM toks WHERE len(t) >= 2
), pairs AS (
  SELECT cb, wb, count(*) AS c2 FROM bg WHERE _r GROUP BY cb, wb
), ctxs AS (
  SELECT cb, count(*) AS c1 FROM bg WHERE _r GROUP BY cb
), nlls AS (
  SELECT bg.doc_id,
         CAST(round(-(ln(coalesce(c2, 0) + 1.0)
                      - ln(coalesce(c1, 0) + {_N_BUCKETS})) * {_SCALE}) AS BIGINT) AS nll
  FROM bg LEFT JOIN pairs USING (cb, wb) LEFT JOIN ctxs USING (cb)
), scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(nll) AS BIGINT) AS nll_micro FROM nlls GROUP BY doc_id
), perdoc AS (
  SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
         coalesce(nll_micro, 0) AS nll_micro,
         CASE WHEN coalesce(n_bigrams, 0) > 0
              THEN coalesce(nll_micro, 0) // coalesce(n_bigrams, 0) END AS mean_nll_micro
  FROM documents d LEFT JOIN scored USING (doc_id)
), cuts AS (
  SELECT quantile_cont(mean_nll_micro,
                       [CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3]) AS c
  FROM perdoc WHERE n_bigrams > 0
), labeled AS (
  SELECT doc_id, n_bigrams, nll_micro, mean_nll_micro,
         CASE WHEN n_bigrams = 0 THEN 'short'
              WHEN mean_nll_micro <= c[1] THEN 'head'
              WHEN mean_nll_micro <= c[2] THEN 'middle'
              ELSE 'tail' END AS ppl_bucket
  FROM perdoc CROSS JOIN cuts
)
SELECT doc_id, n_bigrams, nll_micro, mean_nll_micro, ppl_bucket,
       ppl_bucket != 'tail' AS keep
FROM labeled ORDER BY doc_id
"""

QUERIES = {"d28_lm_perplexity": d28_lm_perplexity}
ORACLES = {"d28_lm_perplexity": D28_ORACLE_SQL}
