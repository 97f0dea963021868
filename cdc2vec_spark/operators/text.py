"""Text analysis — SURVEY §2.2 D4/D5 plus the training-data-pipeline text
operators: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All pure built-in expressions (split/length/array HOFs/md5) — the text
hot path stays JVM-side; there is no Python between parquet scan and
aggregate, so these run at scan throughput on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, rebalance


def d4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (count, mean chars, mean length)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(F.length("text")), 2).alias("avg_len"),
        )
        .orderBy("lang")
    )


def d5_slicing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source × language slicing — the bread-and-butter corpus triage agg."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "lang")
    )


def token_count(text_col: str = "text") -> F.Column:
    """Whitespace token count (single-space corpus → plain split)."""
    return F.size(F.split(F.col(text_col), " "))


def t1_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count().alias("n_tokens")).orderBy("doc_id")


def t5_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: alpha runs, digit runs, and single
    non-alnum marks as separate tokens (the pre-tokenizer split most BPE
    vocabularies assume). Pure JVM regexp — the pattern is RE2/Java
    portable so the DuckDB oracle applies the identical split."""
    d = load_table(spark, sf_dir, "documents")
    # token array projected once (round 15): n_tokens and first_tok each
    # re-ran the full regexp extraction per row as a raw expression
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0))
    return (
        d.select("doc_id", toks.alias("_t"))
        .select(
            "doc_id",
            F.size("_t").alias("n_tokens"),
            F.element_at("_t", 1).alias("first_tok"),
        )
        .orderBy("doc_id")
    )


def quality_score(text_col: str = "text") -> F.Column:
    """Lexical-diversity quality score: distinct-token ratio, rounded.
    (The classic punct/stopword ratios degenerate on this synthetic corpus;
    diversity is the discriminating signal it does have.)"""
    # token array bound once per row (round 15): the distinct-count and
    # total-count each re-split the text as a raw repeated expression
    return F.transform(
        F.array(F.split(F.col(text_col), " ")),
        lambda toks: F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 4
        ),
    )[0]


def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score().alias("quality")).orderBy("doc_id")


def lang_guess(text_col: str = "text") -> F.Column:
    """Deterministic stopword-hit language heuristic. On real corpora the
    hit-sets differ per language; the padded-LIKE form keeps it exactly
    portable to the SQL oracle."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    return (
        F.when(padded.like("% the %") | padded.like("% a %"), "en")
        .otherwise("other")
    )


def t3_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(lang_guess().alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_guess")
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", n: int = 5, out_col: str = "fp"
) -> DataFrame:
    """Document fingerprint: minimum md5 over word n-gram shingles (the
    min-sampling step of winnowing). Short docs (< n tokens) fall back to
    md5(text).

    Tokens are materialized in their own projection first — a raw
    `split(...)` referenced inside the gram lambda gets embedded in the
    lambda body and re-evaluated per element_at (n full re-splits of the
    text per gram)."""
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.md5(
            F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
        ),
    )
    fp = F.when(F.size(toks) < n, F.md5(F.col(text_col))).otherwise(F.array_min(grams))
    return (
        df.withColumn("_toks", F.split(F.lower(F.col(text_col)), " "))
        .withColumn(out_col, fp)
        .drop("_toks")
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021's
    repetition filters, the token-level forms):

    - ``repeated_token_ratio`` — 1 − distinct/total tokens. Pure JVM
      array expressions, no shuffle.
    - ``top_ngram_fraction`` — fraction of the doc's tokens covered by
      its single most frequent word n-gram (`count·n / tokens`). Word
      n-grams explode to (doc, gram) rows and aggregate in two stages —
      partial (map-side) counts collapse repeats before the shuffle, and
      the per-doc winner is `max(struct(count, gram))` so ties break
      deterministically to the lexicographically-largest gram.

    Filters like "drop docs with top_ngram_fraction > 0.2" are the
    standard corpus-cleaning step these feed at 100 TB; both metrics
    shuffle at most one (doc, gram) row per DISTINCT gram occurrence."""
    toks = F.col("_toks")
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty —
    # docs shorter than n tokens must produce no grams at all
    grams_expr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = (
        docs.select(id_col, F.split(F.col(text_col), " ").alias("_toks"))
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "repeated_token_ratio",
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
                4,
            ),
        )
    )
    gram_counts = (
        base.select(id_col, "n_tokens", F.explode(grams_expr).alias("gram"))
        .groupBy(id_col, "n_tokens", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "n_tokens")
        .agg(F.max(F.struct(F.col("c"), F.col("gram"))).alias("top"))
        .select(
            id_col,
            F.col("top.gram").alias("top_ngram"),
            F.col("top.c").alias("top_ngram_count"),
            F.round(
                F.col("top.c") * n / F.col("n_tokens").cast("double"), 4
            ).alias("top_ngram_fraction"),
        )
    )
    return (
        base.select(id_col, "n_tokens", "repeated_token_ratio")
        .join(gram_counts, id_col, "left")
        .orderBy(id_col)
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    embedding/RAG pipeline primitive (a doc longer than the embedder's
    context embeds as chunks; ``chunk_tokens - stride`` tokens of
    overlap preserve cross-boundary context).

    Pure JVM expressions end to end: tokenize once, compute the chunk
    count arithmetically, `transform(sequence(...))` + `slice` builds
    every chunk, then ONE explode — a narrow map over the scan, no
    Python, no shuffle. Returns (id, chunk_id, n_tokens, chunk_text)
    ordered within each doc; a doc at or under ``chunk_tokens`` yields
    exactly one chunk of itself.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError(f"need 0 < stride <= chunk_tokens: {stride}, {chunk_tokens}")
    toks = F.col("_toks")
    n = F.size(toks)
    # K = 1 covering chunk for short docs; else 1 + ceil((n - C) / S)
    k_expr = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - chunk_tokens) / F.lit(float(stride))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k_expr - 1),
        lambda k: F.struct(
            k.alias("chunk_id"),
            F.least(F.lit(chunk_tokens), n - k * stride).alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(toks, k * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
        ),
    )
    return (
        docs.select(
            id_col, F.split(F.col(text_col), " ").alias("_toks")
        )
        .select(id_col, F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def d15_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking as a graded component (rows-only inside x3; exact DuckDB
    oracle pinned in tests/test_text_quality.py): chunk hash instead of
    text keeps the graded rows narrow."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    return (
        chunk_documents(d)
        .select(
            "doc_id", "chunk_id", "n_tokens", F.md5("chunk_text").alias("chunk_md5")
        )
        .orderBy("doc_id", "chunk_id")
    )


D15_ORACLE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), counted AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= 32 THEN 1
              ELSE 1 + CAST(ceil((len(t) - 32) / 24.0) AS INT) END AS k
  FROM toks
), expanded AS (
  SELECT doc_id, t, unnest(range(0, k)) AS ki FROM counted
)
SELECT doc_id, ki AS chunk_id,
       least(32, len(t) - ki * 24) AS n_tokens,
       md5(array_to_string(t[ki * 24 + 1 : ki * 24 + 32], ' ')) AS chunk_md5
FROM expanded
ORDER BY doc_id, chunk_id
"""


def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: the gram lambda is interpreted (HOF) — don't pin the
    # whole pass to the file's 1-2 input splits
    d = rebalance(load_table(spark, sf_dir, "documents"))
    return with_fingerprint(d).select("doc_id", "fp").orderBy("doc_id")


def t6_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source EXACT token-length percentiles (p50/p90) + counts —
    exact distributed order statistics via Spark's `percentile` sorted
    aggregate (vs b16's fixed-memory sketches: `percentile` materializes
    each group's values, so it is the right tool when group counts are
    bounded — per-SOURCE stats over any corpus, since sources number in
    the thousands — while approx_percentile is the 100 TB default for
    high-cardinality groups). Interpolation matches DuckDB's
    quantile_cont bit-for-bit, so the entry is hash-checked."""
    d = load_table(spark, sf_dir, "documents")
    ntok = "size(split(text, ' '))"
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr(f"percentile({ntok}, 0.5)"), 2).alias("p50_tokens"),
            F.round(F.expr(f"percentile({ntok}, 0.9)"), 2).alias("p90_tokens"),
        )
        .orderBy("source")
    )


T6_ORACLE_SQL = """
SELECT source, count(*) AS n,
       round(quantile_cont(len(string_split(text, ' ')), 0.5), 2) AS p50_tokens,
       round(quantile_cont(len(string_split(text, ' ')), 0.9), 2) AS p90_tokens
FROM documents GROUP BY source ORDER BY source
"""


_VOCAB_K = 20


def t7_vocab_topdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary diagnostic: the top-k terms by DOCUMENT
    frequency (every tokenizer/stopword/boilerplate decision starts
    from this report). `array_distinct` BEFORE the explode bounds the
    shuffle by per-doc vocabulary (the d11 discipline); the aggregate
    is one exchange; the top-k is a TakeOrderedAndProject, never a
    global sort. Deterministic order: df desc, then term."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(_VOCAB_K)
    )


T7_ORACLE_SQL = f"""
SELECT term, count(*) AS df FROM (
  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS term
  FROM documents
) GROUP BY term ORDER BY df DESC, term LIMIT {_VOCAB_K}
"""


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("spark", "query", "window", "vector")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 lexical retrieval (Robertson & Zaragoza 2009) — the
    text-side complement of the vector ANN operators.

    Spark-first shape for corpus scale: term frequencies explode only
    the QUERY terms (an `isin` filter inside the scan stage prunes the
    posting explosion to a handful of terms), the document-frequency
    table is at most |query| rows and **broadcast**, and corpus stats
    (N, avgdl) are a broadcast 1-row aggregate. Per-doc scores sum
    fixed-point micro-units (like DSIR), so ranking is exactly
    reproducible across partitionings and engines — the reason this
    operator can carry an exact DuckDB oracle (tests/test_text_quality.py).

    Returns the top ``k`` of (id, n_hit_terms, score_micro), ties broken
    by id.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "dl", F.size("_t")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select(id_col, "dl", F.explode("_t").alias("term"))
        .where(F.col("term").isin(*query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_ts",
            F.col("_idf")
            * (F.col("tf") * (_BM25_K1 + 1))
            / (
                F.col("tf")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum(F.round(F.col("_ts") * 1e6).cast("long")).alias(
                "score_micro"
            ),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(k)
    )


def d17_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed query over documents (rows-only inside
    x3; exact DuckDB oracle pinned in tests/test_text_quality.py)."""
    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_QUERY)


D17_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t,
         len(string_split(lower(text), ' ')) AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS N, avg(dl) AS avgdl FROM base
), expl AS (
  SELECT doc_id, dl, unnest(t) AS term FROM base
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM expl
  WHERE term IN ('spark', 'query', 'window', 'vector')
  GROUP BY doc_id, dl, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (N - df + 0.5) / (df + 0.5))
         * (tf * ({_BM25_K1} + 1))
         / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)) AS ts
  FROM tf JOIN dft USING (term) CROSS JOIN stats
)
SELECT doc_id, count(*) AS n_hit_terms,
       CAST(sum(CAST(round(ts * 1e6) AS BIGINT)) AS BIGINT) AS score_micro
FROM scored GROUP BY doc_id
ORDER BY score_micro DESC, doc_id LIMIT 10
"""


def nfc_normalize_udf():
    """Unicode NFC normalization as an Arrow-batched pandas UDF — the
    canonicalization pass every web corpus needs before hashing text
    (a decomposed 'e'+COMBINING-ACUTE and the composed 'é' are the SAME
    document to a human and DIFFERENT documents to md5/minhash/BM25;
    mixed normalization forms are ubiquitous in crawled text). Spark has
    no built-in normalizer expression, so this is the documented
    pandas-UDF fallback (SURVEY §7 "UDFs are the slow path" exception:
    built-ins genuinely cannot express it); Python's unicodedata NFC is
    byte-identical to DuckDB's nfc_normalize, which makes the operator
    oracle-checkable."""
    import pandas as pd  # noqa: F401 — resolved by the UDF type hints

    def _nfc(s: "pd.Series") -> "pd.Series":
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # explicit hints via __annotations__ won't resolve a function-local
    # pd under `from __future__ import annotations`; bind the UDF with
    # the evaluated types instead
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_nfc, "string")


# the probe marker is a DECOMPOSED sequence (e + U+0301); the fixture
# text is ASCII, so appending it makes the normalization observable —
# len shrinks by exactly 1 when NFC composes the pair
_NFC_MARKER = "é"


def t9_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 — NFC canonicalization. Round-14 shape (guide §4: eliminate
    the Python boundary for rows that don't need it): ASCII text is
    NFC-invariant, and the appended probe marker starts with a starter
    ('e'), so normalization cannot compose across the junction —
    NFC(text ⧺ marker) = text ⧺ 'é' (U+00E9) for ASCII ``text``. The
    ASCII test is pure JVM (octet_length == char length under UTF-8),
    so the UDF's INPUT is nulled for ASCII rows — the Arrow batch then
    carries only a null bitmap for them (no text bytes cross the
    boundary, unicodedata never runs) and the JVM-side when() supplies
    the fast concat; on an ASCII-dominant corpus (this fixture: 100%)
    the Python side does no per-row work at all. One scan, one pass —
    at 100 TB the Python boundary cost becomes proportional to the
    non-ASCII fraction instead of the corpus size."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    nfc = nfc_normalize_udf()
    raw = F.concat(F.col("text"), F.lit(_NFC_MARKER))
    is_ascii = F.octet_length("text") == F.length("text")
    # NULL text rides the slow arm (~coalesce → true) and keeps the
    # original NULL-in/NULL-out behavior
    slow_in = F.when(~F.coalesce(is_ascii, F.lit(False)), raw)
    # COMPOSED U+00E9 (explicit escape — _NFC_MARKER is the decomposed
    # pair, and the two are visually identical in source)
    nfc_col = F.when(
        is_ascii, F.concat(F.col("text"), F.lit("\u00e9"))
    ).otherwise(nfc(slow_in))
    return (
        d.select(
            "doc_id",
            nfc_col.alias("_nfc"),
            F.length(raw).alias("len_raw"),
        )
        .select(
            "doc_id",
            F.md5("_nfc").alias("nfc_md5"),
            "len_raw",
            F.length("_nfc").alias("len_nfc"),
        )
        .orderBy("doc_id")
    )


T9_ORACLE_SQL = """
SELECT doc_id,
       md5(nfc_normalize(text || 'e' || chr(769))) AS nfc_md5,
       len(text || 'e' || chr(769)) AS len_raw,
       len(nfc_normalize(text || 'e' || chr(769))) AS len_nfc
FROM documents ORDER BY doc_id
"""


def pmi_collocations(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """PMI collocation extraction (Church & Hanks 1990) — the corpus-
    statistics pass behind phrase mining / stop-pair lists / tokenizer
    merge seeding: unordered token pairs co-occurring within ``window``
    positions, scored by pointwise mutual information against the
    unigram model and reported as the top-``k`` collocations with
    support ≥ ``min_count``.

    Spark-first shape: pair generation is a pure scan-stage HOF (one
    ``transform(sequence)`` per offset, concat, ONE explode — no
    self-join on position), so the only shuffles are the pair-count and
    unigram aggregations; the corpus totals ride a broadcast 1-row
    frame and the unigram counts broadcast into the pair join (vocab ≪
    pairs by Zipf). PMI is computed on exact integer counts through one
    identically-ordered double expression (micro fixed-point, the d13
    ln discipline), so the operator carries an exact DuckDB oracle.

    Returns (a, b, n_ab, pmi_micro) ordered by pmi desc, pair asc."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    d = docs.select(toks.alias("t"))
    empty = F.array().cast("array<struct<a:string,b:string>>")

    def offset_pairs(j: int) -> Column:
        t = F.col("t")
        return F.when(
            F.size(t) >= j + 1,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - j),
                lambda i: F.struct(
                    F.least(
                        F.element_at(t, i), F.element_at(t, i + j)
                    ).alias("a"),
                    F.greatest(
                        F.element_at(t, i), F.element_at(t, i + j)
                    ).alias("b"),
                ),
            ),
        ).otherwise(empty)

    all_pairs = F.concat(*[offset_pairs(j) for j in range(1, window + 1)])
    pc = (
        d.select(F.explode(all_pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()  # feeds both the totals and the scored join
    )
    uni = (
        d.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    tot = F.broadcast(
        uni.agg(F.sum("n").cast("long").alias("n_tok")).crossJoin(
            pc.agg(F.sum("n_ab").cast("long").alias("n_pairs"))
        )
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("n").alias("_na"))
    ub = uni.select(F.col("tok").alias("b"), F.col("n").alias("_nb"))
    pmi = F.round(
        1_000_000
        * F.log(
            (F.col("n_ab") * 1.0 / F.col("n_pairs"))
            / (
                (F.col("_na") * 1.0 / F.col("n_tok"))
                * (F.col("_nb") * 1.0 / F.col("n_tok"))
            )
        )
    ).cast("long")
    out = (
        pc.where(F.col("n_ab") >= min_count)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(tot)
        .select("a", "b", "n_ab", pmi.alias("pmi_micro"))
        .orderBy(F.col("pmi_micro").desc(), "a", "b")
        .limit(k)
    )
    out = out.localCheckpoint(eager=True)
    pc.unpersist()
    uni.unpersist()
    return out


def t10_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 (added round 10) — top-50 window-2 PMI collocations with
    support ≥ 5 over the documents table."""
    return pmi_collocations(load_table(spark, sf_dir, "documents"))


T10_ORACLE_SQL = """
WITH tok AS (
  SELECT string_split(lower(text), ' ') AS t FROM documents
), pairs AS (
  SELECT unnest(
    list_concat(
      CASE WHEN len(t) >= 2 THEN
        list_transform(range(1, len(t)), i ->
          struct_pack(a := least(t[i], t[i+1]), b := greatest(t[i], t[i+1])))
      ELSE [] END,
      CASE WHEN len(t) >= 3 THEN
        list_transform(range(1, len(t) - 1), i ->
          struct_pack(a := least(t[i], t[i+2]), b := greatest(t[i], t[i+2])))
      ELSE [] END
    )
  ) AS p FROM tok
), pc AS (
  SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS n_ab
  FROM pairs GROUP BY p.a, p.b
), uni AS (
  SELECT tk AS tok, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(t) AS tk FROM tok) GROUP BY tk
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tok,
         (SELECT CAST(sum(n_ab) AS BIGINT) FROM pc) AS n_pairs
  FROM uni
)
SELECT a, b, n_ab,
       CAST(round(1000000 * ln((n_ab * 1.0 / n_pairs)
            / ((ua.n * 1.0 / n_tok) * (ub.n * 1.0 / n_tok)))) AS BIGINT)
         AS pmi_micro
FROM pc JOIN uni ua ON ua.tok = pc.a JOIN uni ub ON ub.tok = pc.b
CROSS JOIN tot
WHERE n_ab >= 5
ORDER BY pmi_micro DESC, a, b LIMIT 50
"""


def sentence_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc sentence segmentation report — the Gopher-class shape
    signal (too-few / degenerately-long sentences flag boilerplate and
    machine-generated text): split on `[.!?]+` runs, keep sentences
    with ≥1 token, report count / mean tokens / max tokens. Pure
    scan-stage HOF expression work (regex portable Java ≡ RE2, the d20
    discipline) — no shuffle before the ordering sort; the mean is ONE
    integer-sum / integer-count division, identical in both engines."""
    # The per-sentence token-count array is materialized ONCE in its own
    # projection (round 15): referenced directly from the final select it
    # was re-evaluated per consumer — size twice, the sum aggregate, and
    # array_max each re-ran the full regex-split + per-sentence tokenize
    # chain per row (interpreted HOFs have no common-subexpression cache).
    sents = F.split(F.coalesce(F.col(text_col), F.lit("")), "[.!?]+")
    counts = F.filter(
        F.transform(
            sents,
            lambda s: F.size(F.filter(F.split(s, " "), lambda w: w != "")),
        ),
        lambda c: c > 0,
    )
    n = F.size("_counts")
    total = F.aggregate(
        F.col("_counts"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return (
        docs.select(F.col(id_col), counts.alias("_counts"))
        .select(
            F.col(id_col),
            n.cast("long").alias("n_sentences"),
            F.when(n > 0, F.round(total / n, 2)).alias("avg_sent_tokens"),
            F.when(n > 0, F.array_max("_counts").cast("long")).alias(
                "max_sent_tokens"
            ),
        )
        .orderBy(id_col)
    )


def t11_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11 (added round 10) — per-doc sentence count / mean / max token
    shape. The fixture corpus carries no sentence punctuation (every
    doc would be one trivial sentence), so the entry synthesizes it
    deterministically first — a period after every 7th token (the
    d20/d30 synthesized-input pattern, mirrored token-for-token by the
    oracle) — and the segmentation logic is then genuinely exercised
    with variable sentence counts."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    # Spark's transform index is 0-based, DuckDB's 1-based: (i+1) here
    # aligns with `i` there
    punct = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when((i + 1) % 7 == 0, F.concat(x, F.lit(".")))
            .otherwise(x),
        ),
        " ",
    )
    return sentence_stats(d.select("doc_id", punct.alias("text")))


T11_ORACLE_SQL = """
WITH p AS (
  SELECT doc_id,
         array_to_string(list_transform(
           string_split(coalesce(text, ''), ' '),
           (x, i) -> CASE WHEN i % 7 = 0 THEN x || '.' ELSE x END
         ), ' ') AS text
  FROM documents
),
c AS (
  SELECT doc_id,
         list_filter(list_transform(
           string_split_regex(coalesce(text, ''), '[.!?]+'),
           s -> len(list_filter(string_split(s, ' '), w -> w <> ''))
         ), x -> x > 0) AS counts
  FROM p
)
SELECT doc_id,
       CAST(len(counts) AS BIGINT) AS n_sentences,
       CASE WHEN len(counts) > 0
            THEN round(CAST(list_sum(counts) AS DOUBLE) / len(counts), 2)
       END AS avg_sent_tokens,
       CASE WHEN len(counts) > 0
            THEN CAST(list_max(counts) AS BIGINT)
       END AS max_sent_tokens
FROM c ORDER BY doc_id
"""


def t12_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 (added round 11) — the Gopher repetition filters' hash-exact
    face (Rae et al. 2021 §A1.1; the float ``repetition_stats`` form
    stays for engine use): per-doc repeated-token ratio and top-bigram
    coverage in integer BASIS POINTS, so every value is a BIGINT ``div``
    — bit-identical in Spark and any SQL oracle, no float rounding in
    the hashed surface. ``repeated_bp = (n_tokens − n_distinct)·10⁴ div
    n_tokens``; ``top_bigram_bp = top_count·2·10⁴ div n_tokens``. The
    winning bigram ties break (count DESC, gram ASC), which the
    longest-run scan below reproduces exactly. Docs with < 2 tokens
    have no bigrams: count/bp are 0, the gram ''. Plan (round 14,
    guide §2.4 — remove shuffles outright): the winner is computed
    ENTIRELY in the scan stage — sort the per-doc gram array and take
    the longest run (strictly-greater update, so on a count tie the
    FIRST — i.e. smallest — gram wins, exactly the old
    ``min(struct(−count, gram))`` rule). The old shape (explode → two
    aggregation Exchanges, one a SortAggregate on min(struct) → join
    back to a SECOND documents scan) is gone: one scan, zero mid-plan
    exchanges, the presentation sort is the only one left. Filters
    like "drop docs with top_bigram_bp > 2000" are the 100 TB
    corpus-cleaning step this feeds — and per-doc scan-stage math is
    the shape that scales there."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    base = d.select("doc_id", toks.alias("_toks")).select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_distinct"),
        F.array_sort(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("_toks"), i),
                        F.element_at(F.col("_toks"), i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_sg"),
    )
    # run boundaries over the sorted array (1-based start positions);
    # runs[k] spans [starts[k], starts[k+1]-1]. A run struct compares
    # (len, −k): array_max picks the longest run, ties the EARLIEST —
    # i.e. the smallest gram, the old (count DESC, gram ASC) rule.
    sg = F.col("_sg")
    n = F.size(sg)
    neq = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(2), n),
            lambda i: F.element_at(sg, i) != F.element_at(sg, i - 1),
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.when(
        n >= 1, F.concat(F.array(F.lit(1)), neq)
    ).otherwise(F.array().cast("array<int>"))
    base = base.withColumn("_st", starts)
    st = F.col("_st")
    runs = F.transform(
        st,
        lambda s, k: F.struct(
            (
                F.coalesce(F.try_element_at(st, k + 2), F.size(F.col("_sg")) + 1)
                - s
            ).cast("long").alias("len"),
            (-k).alias("negk"),
            F.element_at(F.col("_sg"), s).alias("g"),
        ),
    )
    # winner struct materialized once (round 15): the two field reads in
    # the final select each re-ran array_max over the runs transform
    base = base.withColumn("_win", F.array_max(runs))
    win = F.col("_win")
    return (
        base.select(
            "doc_id",
            "n_tokens",
            F.expr(
                "(n_tokens - n_distinct) * 10000 div n_tokens"
            ).alias("repeated_bp"),
            F.coalesce(win["g"], F.lit("")).alias("top_bigram"),
            F.coalesce(win["len"], F.lit(0).cast("long")).alias(
                "top_bigram_count"
            ),
        )
        .withColumn(
            "top_bigram_bp",
            F.expr("top_bigram_count * 20000 div n_tokens"),
        )
        .orderBy("doc_id")
    )


T12_ORACLE_SQL = """
WITH base AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents
),
s AS (
  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
         CASE WHEN len(t) >= 2
              THEN list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM base
),
gc AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS gram FROM s) GROUP BY ALL
),
top AS (
  SELECT doc_id, gram AS top_bigram, c AS top_bigram_count FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
    FROM gc
  ) r WHERE rn = 1
)
SELECT s.doc_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST((s.n_tokens - s.n_distinct) * 10000 // s.n_tokens AS BIGINT)
           AS repeated_bp,
       coalesce(top.top_bigram, '') AS top_bigram,
       CAST(coalesce(top.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       CAST(coalesce(top.top_bigram_count, 0) * 20000 // s.n_tokens AS BIGINT)
           AS top_bigram_bp
FROM s LEFT JOIN top USING (doc_id) ORDER BY s.doc_id
"""


def t13_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13 (added round 14) — per-doc Flesch reading-ease in integer
    MICRO units (Flesch 1948; the readability band every web-corpus
    quality report carries next to t2's heuristic score — C4 and
    RefinedWeb both slice by readability-class signals): with
    wps = words/sentence and spw = syllables/word,

        flesch_micro = 206_835_000
                     - (1015 * wps_micro) div 1000
                     - (84600 * spw_micro) div 1000

    where ``*_micro`` are the two ratios in integer micro units
    (``a * 1_000_000 div b`` — the d45/t12 no-float-on-the-hashed-
    surface discipline; every operand stays far inside int64).

    Inputs are deterministic: sentences come from the t11 synthesized
    punctuation (a period after every 7th token — the fixture corpus
    carries none of its own); words are the raw text's non-empty
    lowercased tokens; syllables use the standard vowel-group heuristic
    max(1, count of ``[aeiouy]+`` runs per word) — a regexp count the
    oracle mirrors with ``regexp_extract_all``. Pure scan-stage
    expression work (one regexp per token inside a HOF aggregate — the
    t4 bounded-interpreted-HOF shape); the only exchange is the
    presentation sort. Docs with zero words are excluded (mirrored).

    rebalance (round 15): the fixture is a single parquet split and the
    per-token regexp HOF is the expensive stage — unrebalanced it ran
    serialized on 1-2 cores (the t4/d53 single-split hazard; the r14
    driver measured an 8c/32c scaling ratio of 1.01 here, the
    serialized signature)."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    # word tokens materialized once (round 15): n_words and the syllable
    # aggregate each re-ran the split+filter per row when it was a raw
    # expression (no common-subexpression cache in interpreted HOFs)
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
        lambda w: w != "",
    )
    d = d.select("doc_id", "text", toks.alias("_w"))
    n_words = F.size("_w")
    n_syll = F.aggregate(
        F.col("_w"),
        F.lit(0).cast("long"),
        lambda a, w: a
        + F.greatest(F.lit(1), F.regexp_count(w, F.lit("[aeiouy]+"))),
    )
    # t11's deterministic sentence synthesis + segmentation rule
    rtoks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    punct = F.array_join(
        F.transform(
            rtoks,
            lambda x, i: F.when((i + 1) % 7 == 0, F.concat(x, F.lit(".")))
            .otherwise(x),
        ),
        " ",
    )
    sents = F.split(punct, "[.!?]+")
    n_sents = F.size(
        F.filter(
            F.transform(
                sents,
                lambda s: F.size(F.filter(F.split(s, " "), lambda w: w != "")),
            ),
            lambda c: c > 0,
        )
    )
    return (
        d.select(
            "doc_id",
            n_words.cast("long").alias("n_words"),
            n_sents.cast("long").alias("n_sentences"),
            n_syll.alias("n_syllables"),
        )
        .where((F.col("n_words") > 0) & (F.col("n_sentences") > 0))
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                "206835000"
                " - (1015 * (n_words * 1000000 div n_sentences)) div 1000"
                " - (84600 * (n_syllables * 1000000 div n_words)) div 1000"
            ).cast("long").alias("flesch_micro"),
        )
        .orderBy("doc_id")
    )


T13_ORACLE_SQL = """
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         text
  FROM base
),
counts AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(
           toks,
           t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+')))
         )), 0) AS BIGINT) AS n_syllables,
         array_to_string(list_transform(
           string_split(text, ' '),
           (x, i) -> CASE WHEN i % 7 = 0 THEN x || '.' ELSE x END
         ), ' ') AS ptext
  FROM w
),
s AS (
  SELECT doc_id, n_words, n_syllables,
         CAST(len(list_filter(list_transform(
           string_split_regex(ptext, '[.!?]+'),
           seg -> len(list_filter(string_split(seg, ' '), x -> x <> ''))
         ), c -> c > 0)) AS BIGINT) AS n_sentences
  FROM counts
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       206835000
         - (1015 * (n_words * 1000000 // n_sentences)) // 1000
         - (84600 * (n_syllables * 1000000 // n_words)) // 1000 AS flesch_micro
FROM s
WHERE n_words > 0 AND n_sentences > 0
ORDER BY doc_id
"""


QUERIES = {
    "d4_text_stats": d4_text_stats,
    "d5_slicing": d5_slicing,
    "t1_token_count": t1_token_count,
    "t2_quality_score": t2_quality_score,
    "t5_regex_tokens": t5_regex_tokens,
    "t3_lang_guess": t3_lang_guess,
    "t4_fingerprint": t4_fingerprint,
    # round-7 rotation: individually graded (were composite-delivered)
    "d15_chunk": d15_chunk,
    "d17_bm25": d17_bm25,
    "t6_length_percentiles": t6_length_percentiles,
    "t7_vocab_topdf": t7_vocab_topdf,
    # round-8 addition: composite-delivered (x4), oracle in
    # tests/test_text_quality.py
    "t9_nfc_normalize": t9_nfc_normalize,
    # round-10 addition: composite-delivered (x4), oracle in
    # tests/test_text_quality.py; rotation candidate
    "t10_pmi_collocations": t10_pmi_collocations,
    # round-10 addition: composite-delivered (x4), oracle in
    # tests/test_text_quality.py; rotation candidate
    "t11_sentence_stats": t11_sentence_stats,
    # round-11 addition: composite-delivered (x4), oracle in
    # tests/test_text_quality.py; rotation candidate
    "t12_repetition_stats": t12_repetition_stats,
    # round-14 addition: composite-delivered (x4), oracle in
    # tests/test_text_quality.py; rotation candidate for round 15
    "t13_readability": t13_readability,
}

ORACLES = {
    "t9_nfc_normalize": T9_ORACLE_SQL,
    "t10_pmi_collocations": T10_ORACLE_SQL,
    "t11_sentence_stats": T11_ORACLE_SQL,
    "t12_repetition_stats": T12_ORACLE_SQL,
    "t13_readability": T13_ORACLE_SQL,
    # round-7 rotation: individually graded (were composite-delivered)
    "d15_chunk": D15_ORACLE_SQL,
    "d17_bm25": D17_ORACLE_SQL,
    "t6_length_percentiles": T6_ORACLE_SQL,
    "t7_vocab_topdf": T7_ORACLE_SQL,
    "d4_text_stats": (
        "SELECT lang, count(*) AS n, round(avg(n_chars), 2) AS avg_chars, "
        "round(avg(length(text)), 2) AS avg_len FROM documents "
        "GROUP BY lang ORDER BY lang"
    ),
    "d5_slicing": (
        "SELECT source, lang, count(*) AS n FROM documents "
        "GROUP BY source, lang ORDER BY source, lang"
    ),
    "t1_token_count": (
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens "
        "FROM documents ORDER BY doc_id"
    ),
    "t2_quality_score": (
        "SELECT doc_id, round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) "
        "/ len(string_split(text, ' ')), 4) AS quality FROM documents ORDER BY doc_id"
    ),
    "t5_regex_tokens": (
        "SELECT doc_id, len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens, "
        "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')[1] AS first_tok "
        "FROM documents ORDER BY doc_id"
    ),
    "t3_lang_guess": (
        "SELECT lang_guess, count(*) AS n FROM ("
        "SELECT CASE WHEN ' ' || text || ' ' LIKE '% the %' "
        "OR ' ' || text || ' ' LIKE '% a %' THEN 'en' ELSE 'other' END AS lang_guess "
        "FROM documents) t GROUP BY lang_guess ORDER BY lang_guess"
    ),
    "t4_fingerprint": (
        "SELECT doc_id, CASE WHEN len(toks) < 5 THEN md5(text) ELSE "
        "list_min(list_transform(range(1, len(toks) - 3), "
        "i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) "
        "END AS fp FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks "
        "FROM documents) t ORDER BY doc_id"
    ),
}
