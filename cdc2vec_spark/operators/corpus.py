"""End-to-end corpus cleaning — the composition the individual operators
exist for: raw documents → exact dedup → quality filter →
benchmark decontamination → per-slice summary of the surviving
training corpus.

This is the "user story" query of the LLM-data-pipeline surface
(SURVEY §2.2 group D): every stage is one of the already-graded
primitives, composed as a single declarative plan Catalyst optimizes
end to end — the dedup window, the quality predicate (evaluated in the
scan stage), the broadcast decontamination join, and the final
aggregate all pipeline without materialization barriers.

Deterministic and portable SQL throughout, so the WHOLE composition
carries an exact DuckDB oracle (pinned in tests/test_corpus.py at two
scale factors; graded rows-only inside x2_rowsonly_dedup — the
50-entry registry budget is full, SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table, rebalance
from .decontam import _BENCH_MOD, _THRESHOLD, decontaminate

_MIN_TOKENS = 5
_MIN_DIVERSITY = 0.5


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving training documents after the three cleaning stages.

    1. exact dedup — one survivor (min id) per distinct text;
    2. quality — at least ``_MIN_TOKENS`` tokens and distinct-token
       ratio >= ``_MIN_DIVERSITY`` (the t2 lexical-diversity score);
    3. decontamination — drop docs whose trigram overlap with the
       benchmark reaches the d11 threshold.

    Returns the surviving rows of ``docs`` (all columns).
    """
    from pyspark import StorageLevel

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    toks = F.split(F.col(text_col), " ")
    quality = deduped.where(
        (F.size(toks) >= _MIN_TOKENS)
        & (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            >= _MIN_DIVERSITY
        )
    )
    # quality feeds BOTH decontaminate's gram explode and the final
    # left-semi join; Catalyst does not dedupe a common subplan across a
    # join, so without a persist the dedup window + quality predicate run
    # twice — at 100 TB that is a second full scan + shuffle of the
    # corpus. persist() registers the canonicalized plan with the
    # CacheManager once (repeated calls reuse the same entry; eviction is
    # LRU), so the executed plan reads quality from InMemoryTableScan on
    # the join side.
    quality = quality.persist(StorageLevel.MEMORY_AND_DISK)
    keep = decontaminate(quality, benchmark, id_col=id_col, text_col=text_col)
    return quality.join(
        keep.where(~F.col("contaminated")).select(id_col),
        id_col,
        "left_semi",
    )


def d16_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded composition entry: clean the non-benchmark corpus against
    the doc_id % 29 benchmark slice, then summarize survivors per
    (source, lang) with doc and token counts."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    train = d.filter(F.col("doc_id") % _BENCH_MOD != 0)
    surv = clean_corpus(train, bench)
    return (
        surv.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
        )
        .orderBy("source", "lang")
    )


# DuckDB mirror — the exact oracle of the whole composition.
D16_ORACLE_SQL = f"""
WITH train0 AS (
  SELECT * FROM documents WHERE doc_id % {_BENCH_MOD} <> 0
), deduped AS (
  SELECT * FROM train0
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), quality AS (
  SELECT * FROM deduped
  WHERE len(string_split(text, ' ')) >= {_MIN_TOKENS}
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')) >= {_MIN_DIVERSITY}
), toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t, lower(text) AS lt,
         FALSE AS is_bench
  FROM quality
  UNION ALL
  SELECT doc_id, string_split(lower(text), ' '), lower(text), TRUE
  FROM documents WHERE doc_id % {_BENCH_MOD} = 0
), grams AS (
  SELECT doc_id, is_bench,
         list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [lt] END
         ) AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT md5(unnest(gs)) AS g, 1 AS hit FROM grams WHERE is_bench
), traing AS (
  SELECT doc_id, md5(unnest(gs)) AS g FROM grams WHERE NOT is_bench
), overlap AS (
  SELECT t.doc_id,
         (CAST(count(b.hit) AS DOUBLE) / count(*)) >= {_THRESHOLD} AS contaminated
  FROM traing t LEFT JOIN bench b USING (g)
  GROUP BY t.doc_id
)
SELECT q.source, q.lang, count(*) AS n_docs,
       CAST(sum(len(string_split(q.text, ' '))) AS BIGINT) AS n_tokens
FROM quality q JOIN overlap o ON q.doc_id = o.doc_id AND NOT o.contaminated
GROUP BY q.source, q.lang
ORDER BY q.source, q.lang
"""

def d27_full_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data preparation story as ONE declarative
    plan: PII scrub (with the d20 synthesized-PII device so the stage is
    non-vacuous on the fixtures) → exact dedup → quality filter →
    benchmark decontamination → per-source token-budget mixing →
    deterministic train/holdout split → per-(split, source) summary.

    Every stage is one of the already-audited primitives (pii.redact,
    clean_corpus, sampling.mix_by_token_budget) composed so Catalyst
    optimizes end to end; the split here uses an md5-prefix rule
    (``substr(md5(id), 1, 2) < '1a'`` ≈ 10.2% holdout) instead of
    d10_split's xxhash64 so the WHOLE composition stays exactly
    DuckDB-portable — the oracle reproduces every stage bit-for-bit.
    """
    from .pii import _with_synth_pii, redact
    from .sampling import mix_by_token_budget

    d = rebalance(load_table(spark, sf_dir, "documents"))
    d = d.withColumn("text", redact(_with_synth_pii(d)))
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    train = d.filter(F.col("doc_id") % _BENCH_MOD != 0)
    surv = clean_corpus(train, bench)
    budget = 400 + 200 * (F.substring("source", -1, 1).cast("int") % 3)
    mixed = mix_by_token_budget(surv, budget)
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a",
        F.lit("holdout"),
    ).otherwise(F.lit("train"))
    return (
        mixed.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


def _d27_oracle() -> str:
    from .pii import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
WITH base AS (
  SELECT doc_id, source,
         regexp_replace(regexp_replace(regexp_replace(
           CASE WHEN doc_id % 7 = 0 THEN
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                  || '.0.1 phone +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE text END,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS t2
  FROM documents
), train0 AS (
  SELECT * FROM base WHERE doc_id % {_BENCH_MOD} <> 0
), deduped AS (
  SELECT * FROM train0
  QUALIFY row_number() OVER (PARTITION BY md5(t2) ORDER BY doc_id) = 1
), quality AS (
  SELECT * FROM deduped
  WHERE len(string_split(t2, ' ')) >= {_MIN_TOKENS}
    AND CAST(len(list_distinct(string_split(t2, ' '))) AS DOUBLE)
        / len(string_split(t2, ' ')) >= {_MIN_DIVERSITY}
), toks AS (
  SELECT doc_id, string_split(lower(t2), ' ') AS t, lower(t2) AS lt,
         FALSE AS is_bench
  FROM quality
  UNION ALL
  SELECT doc_id, string_split(lower(t2), ' '), lower(t2), TRUE
  FROM base WHERE doc_id % {_BENCH_MOD} = 0
), grams AS (
  SELECT doc_id, is_bench,
         list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [lt] END
         ) AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT md5(unnest(gs)) AS g, 1 AS hit FROM grams WHERE is_bench
), traing AS (
  SELECT doc_id, md5(unnest(gs)) AS g FROM grams WHERE NOT is_bench
), overlap AS (
  SELECT t.doc_id,
         (CAST(count(b.hit) AS DOUBLE) / count(*)) >= {_THRESHOLD} AS contaminated
  FROM traing t LEFT JOIN bench b USING (g)
  GROUP BY t.doc_id
), surv AS (
  SELECT q.* FROM quality q
  JOIN overlap o ON q.doc_id = o.doc_id AND NOT o.contaminated
), mixed AS (
  SELECT doc_id, source,
         len(string_split(t2, ' ')) AS n_tokens,
         400 + 200 * (CAST(source[-1] AS INT) % 3) AS budget,
         sum(len(string_split(t2, ' '))) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM surv
), kept AS (
  SELECT * FROM mixed WHERE cum - n_tokens < budget
)
SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR))[1:2] < '1a'
            THEN 'holdout' ELSE 'train' END AS split,
       source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM kept
GROUP BY 1, source
ORDER BY split, source
"""


D27_ORACLE_SQL = _d27_oracle()


def d32_web_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WEB-INGESTION composition — d27's front half for crawled
    input, every stage an already-audited primitive in ONE declarative
    plan: synthesized HTML page + URL per document (the d20/d30/d31
    fixture device) → d30 extraction (tag strip, boilerplate segments,
    entities) → d31 URL curation (normalize, blocklist, per-domain cap)
    → exact dedup on the EXTRACTED text → d28 LM-perplexity terciles
    over the surviving corpus (reference slice lang='en').

    Returns one row per surviving document: (doc_id, domain, n_tokens,
    ppl_bucket, keep). Plan shape: scan-stage synthesis+extraction, one
    domain window, one dedup window, the broadcast LM + one aggregate —
    nothing quadratic, nothing driver-side."""
    from .html_extract import extract_text, synthesize_page
    from .lm import lm_perplexity
    from .urls import cap_domains, synthesize_url

    d = rebalance(load_table(spark, sf_dir, "documents"))
    pages = d.select(
        "doc_id",
        "lang",
        synthesize_page(F.col("doc_id"), F.col("text")).alias("html"),
        synthesize_url(F.col("doc_id")).alias("url"),
    )
    ext = extract_text(pages)
    cap = cap_domains(ext)
    corpus = cap.where("kept").select(
        "doc_id", "lang", "domain", F.col("clean_text").alias("text")
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    deduped = (
        corpus.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # deduped feeds the LM (bigram source + per-doc re-attach) AND the
    # final report join — un-pinned, the synthesize→extract→cap→dedup
    # chain re-derived once per consumer (the d32 plan carried 6
    # documents scans / 50 exchanges). One row per surviving doc —
    # bounded (round 14).
    deduped = deduped.localCheckpoint(eager=True)
    scored = lm_perplexity(deduped, F.col("lang") == "en")
    return (
        deduped.select(
            "doc_id",
            "domain",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .join(scored.select("doc_id", "ppl_bucket", "keep"), "doc_id")
        .orderBy("doc_id")
    )


def _d32_oracle() -> str:
    from .html_extract import _BLOCK_SPLIT, _MIN_WORDS
    from .lm import _N_BUCKETS as _LM_BUCKETS
    from .lm import _SCALE as _LM_SCALE
    from .urls import _BLOCKED, _CAP, _N_DOMAINS

    return f"""
WITH pages AS (
  SELECT doc_id, lang,
         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><style>p {{ margin: 0; }}</style></head><body>'
         || '<ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul>'
         || '<p>' || text || '</p>'
         || '<p>Extra block: Tom &amp; Jerry say &quot;hi&quot; &lt;here&gt;</p>'
         || '<div>Copyright 2024</div></body></html>' AS html,
         'https://www.site' || CAST(doc_id % {_N_DOMAINS} AS VARCHAR) || '.'
         || CASE WHEN doc_id % 3 = 0 THEN 'com'
                 WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END
         || '/Doc/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed#frag' AS url
  FROM documents
), extracted AS (
  SELECT doc_id, lang, url,
         coalesce(array_to_string(list_filter(
           list_transform(
             regexp_split_to_array(
               regexp_replace(html,
                 '<script[^>]*>[^<]*</script>|<style[^>]*>[^<]*</style>', ' ', 'g'),
               '{_BLOCK_SPLIT}'),
             s -> trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(s, '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
               '  *', ' ', 'g'))),
           s -> len(string_split(s, ' ')) >= {_MIN_WORDS}), ' '), '') AS text
  FROM pages
), capped AS (
  SELECT doc_id, lang, text, domain FROM (
    SELECT doc_id, lang, text,
           regexp_extract(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(lower(url), '#.*$', ''),
             '[?].*$', ''), '^https?://', ''), '^www[.]', ''), '/$', ''),
             '^([^/]+)', 1) AS domain,
           row_number() OVER (
             PARTITION BY regexp_extract(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(lower(url),
               '#.*$', ''), '[?].*$', ''), '^https?://', ''), '^www[.]', ''),
               '/$', ''), '^([^/]+)', 1)
             ORDER BY md5('domcap:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rk
    FROM extracted
  ) t WHERE domain NOT IN {_BLOCKED!r} AND rk <= {_CAP}
), deduped AS (
  SELECT * FROM capped
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), toks AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM deduped
), bg AS (
  SELECT doc_id, lang = 'en' AS _r,
         unnest(list_transform(range(1, len(t)),
                i -> ('0x' || substr(md5(t[i]), 1, 8))::BIGINT % {_LM_BUCKETS})) AS cb,
         unnest(list_transform(range(1, len(t)),
                i -> ('0x' || substr(md5(t[i+1]), 1, 8))::BIGINT % {_LM_BUCKETS})) AS wb
  FROM toks WHERE len(t) >= 2
), pairs AS (
  SELECT cb, wb, count(*) AS c2 FROM bg WHERE _r GROUP BY cb, wb
), ctxs AS (
  SELECT cb, count(*) AS c1 FROM bg WHERE _r GROUP BY cb
), nlls AS (
  SELECT bg.doc_id,
         CAST(round(-(ln(coalesce(c2, 0) + 1.0)
                      - ln(coalesce(c1, 0) + {_LM_BUCKETS})) * {_LM_SCALE}) AS BIGINT) AS nll
  FROM bg LEFT JOIN pairs USING (cb, wb) LEFT JOIN ctxs USING (cb)
), scored AS (
  SELECT doc_id, count(*) AS n_bigrams, sum(nll) AS nll_micro FROM nlls GROUP BY doc_id
), perdoc AS (
  SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
         coalesce(nll_micro, 0) AS nll_micro,
         CASE WHEN coalesce(n_bigrams, 0) > 0
              THEN coalesce(nll_micro, 0) // coalesce(n_bigrams, 0) END AS mean_nll_micro
  FROM deduped d LEFT JOIN scored USING (doc_id)
), cuts AS (
  SELECT quantile_cont(mean_nll_micro,
                       [CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3]) AS c
  FROM perdoc WHERE n_bigrams > 0
), labeled AS (
  SELECT doc_id,
         CASE WHEN n_bigrams = 0 THEN 'short'
              WHEN mean_nll_micro <= c[1] THEN 'head'
              WHEN mean_nll_micro <= c[2] THEN 'middle'
              ELSE 'tail' END AS ppl_bucket
  FROM perdoc CROSS JOIN cuts
)
SELECT d.doc_id, d.domain,
       len(string_split(d.text, ' ')) AS n_tokens,
       l.ppl_bucket, l.ppl_bucket != 'tail' AS keep
FROM deduped d JOIN labeled l USING (doc_id)
ORDER BY d.doc_id
"""


D32_ORACLE_SQL = _d32_oracle()

QUERIES = {
    "d16_corpus_pipeline": d16_corpus_pipeline,
    "d27_full_prep": d27_full_prep,
    "d32_web_prep": d32_web_prep,
}
# round-8 rotation: all three individually graded (d27/d32 moved out of
# the composites per VERDICT r07 ask #3; oracles also pinned at two SFs
# in tests/test_corpus.py)
ORACLES = {
    "d16_corpus_pipeline": D16_ORACLE_SQL,
    "d27_full_prep": D27_ORACLE_SQL,
    "d32_web_prep": D32_ORACLE_SQL,
}
