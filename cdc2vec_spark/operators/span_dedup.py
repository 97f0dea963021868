"""Repeated-span removal — exact substring deduplication ACROSS the
corpus (Lee et al. 2021, arXiv:2107.06499 "Deduplicating Training Data
Makes Language Models Better"): token spans of length ``n`` that occur
in more than one document are removed from every document, leaving the
surrounding text intact. This is finer-grained than d1 (whole-doc
dedup) and d2 (near-dup PAIR detection): boilerplate headers, license
blocks and quoted passages die even when the hosting documents are
otherwise unique.

The reference engine has no text operators at all (SURVEY §2.1); this
extends the LLM-data-pipeline surface (group D).

Spark-first shape, and the honest cost at 100 TB:
- the paper builds a suffix array; the distributed-join formulation
  here is the standard Spark port — the work is bounded by TOKEN COUNT,
  not pairs: one (doc, pos, gram-hash) explode (narrow), one aggregate
  to find grams spanning ≥ ``min_docs`` distinct docs, one join back,
  one per-doc collect of start positions (all shuffles O(tokens));
- the final token masking is a pure JVM higher-order ``filter`` over
  the token array against the doc's (tiny) duplicated-start list — no
  Python anywhere (plan-asserted in tests);
- determinism: md5 gram hashes, exact integer positions — no RNG, no
  floats, so the d21 entry carries an exact DuckDB oracle of the whole
  operator (same grams, same mask, same reconstruction) pinned at two
  scale factors in tests/test_span_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, rebalance

_N = 8  # span length in tokens (the paper uses 50 BPE tokens; 8 suits
# the ~60-token fixtures — the operator is parameterized)
_MIN_DOCS = 2


def _doc_grams(docs: DataFrame, n: int, id_col: str, text_col: str):
    """(base, grams): base = (id, token array), grams = one row per
    (id, 1-based pos, md5 gram-hash). Shared by the cross-doc and
    within-doc span removers."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("_t"))
    # (doc, pos, gram-hash), 1-based pos; hash AFTER the explode would
    # re-concat per row — here the transform builds the per-pos gram
    # strings once and posexplode streams them (narrow)
    # sequence(1, x) with x < 1 generates a DESCENDING sequence, so
    # short docs must short-circuit to an empty gram array explicitly
    gram_arr = F.when(
        F.size("_t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(
                    " ", *[F.element_at(F.col("_t"), i + j) for j in range(n)]
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        id_col, F.posexplode(gram_arr).alias("_p0", "g")
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "g")
    return base, grams


def _mask_starts(base: DataFrame, starts: DataFrame, n: int, id_col: str) -> DataFrame:
    """Remove every token covered by a span start list: span starting at
    1-based s covers 1-based positions [s, s+n-1]. Pure JVM HOF filter
    against the doc's (tiny) start list."""
    masked = base.join(starts, id_col, "left").withColumn(
        "_ss", F.coalesce("_ss", F.array().cast("array<integer>"))
    )
    kept = F.filter(
        F.col("_t"),
        lambda x, i: ~F.exists(
            F.col("_ss"), lambda s: (i + 1 >= s) & (i + 1 <= s + (n - 1))
        ),
    )
    return masked.select(
        F.col(id_col),
        F.size("_t").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned"),
    )


def remove_repeated_spans(
    docs: DataFrame,
    n: int = _N,
    min_docs: int = _MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` → (id_col, n_tokens, n_removed, cleaned) where
    ``cleaned`` is the text with every token covered by a cross-doc
    duplicated n-token span removed.

    Positions are 1-based token indices. A document shorter than ``n``
    tokens contributes no spans and passes through unchanged.
    ``min_docs`` counts DISTINCT documents and must be >= 2 (at 1 every
    gram would trivially qualify and delete the whole corpus — use
    ``remove_self_repeats`` for within-document repetition).
    """
    if min_docs < 2:
        raise ValueError(
            "min_docs must be >= 2 (every gram occurs in >= 1 doc; "
            "within-doc repetition is remove_self_repeats' job)"
        )
    from pyspark.sql.window import Window

    base, grams = _doc_grams(docs, n, id_col, text_col)
    # ONE exchange on the gram hash (round 14, guide §2.4), spilled
    # safely (round 15, ADVICE r14): the distinct-doc frequency per gram
    # is two window functions over the same (g)-partitioning — a
    # dense_rank over doc ids, then its per-gram max, which IS
    # count(DISTINCT doc) — so a corpus-wide boilerplate gram streams
    # through the window's spillable sorter instead of accumulating its
    # entire occurrence list in ONE collect_list aggregation buffer (the
    # round-14 shape's executor-OOM hazard at 100 TB: the hot grams are
    # precisely the ones the >= min_docs filter KEEPS). Same exchange
    # count as round 14 (one on g, one on the per-doc starts), the old
    # distinct → groupBy → join-back chain stays gone.
    w_ord = Window.partitionBy("g").orderBy(id_col)
    w_all = Window.partitionBy("g")
    qualified = (
        grams.withColumn("_dr", F.dense_rank().over(w_ord))
        .withColumn("_ddf", F.max("_dr").over(w_all))
        .where(F.col("_ddf") >= min_docs)
    )
    starts = qualified.groupBy(id_col).agg(
        F.collect_list("pos").alias("_ss")
    )
    return _mask_starts(base, starts, n, id_col)


def remove_self_repeats(
    docs: DataFrame,
    n: int = _N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition removal: every n-token span whose
    gram already occurred EARLIER in the same document is removed (the
    first occurrence survives) — the degenerate-generation /
    scraped-page-loop cleaner that complements the cross-doc remover.

    Purely per-document — and since round 14 purely per-ROW: the
    duplicate-start list is derived inside the row by sorting the
    (gram, pos) structs and keeping every entry whose predecessor
    carries the same gram (all but the earliest occurrence, exactly the
    set the old per-(doc, gram) window ranked). ZERO exchanges, no
    re-attach join — the old form shuffled every exploded gram twice
    (window on (id, g), then groupBy(id)) to compute something local to
    the document."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("_t"))
    gram_arr = F.when(
        F.size("_t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(
                    " ", *[F.element_at(F.col("_t"), i + j) for j in range(n)]
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gpos = F.transform(
        gram_arr,
        lambda g, i: F.struct(g.alias("g"), (i + F.lit(1)).alias("p")),
    )
    # array_sort on (g, p) groups equal grams with ascending positions;
    # one aggregate pass keeps every position whose predecessor has the
    # same gram. The sort column is referenced exactly once so the
    # expression is evaluated once per row.
    rep = F.aggregate(
        F.array_sort(gpos),
        F.struct(
            F.lit(None).cast("string").alias("pg"),
            F.array().cast("array<integer>").alias("ss"),
        ),
        lambda acc, x: F.struct(
            x["g"].alias("pg"),
            F.when(
                x["g"] == acc["pg"], F.concat(acc["ss"], F.array(x["p"]))
            )
            .otherwise(acc["ss"])
            .alias("ss"),
        ),
        lambda acc: acc["ss"],
    )
    masked = base.withColumn("_ss", rep)
    kept = F.filter(
        F.col("_t"),
        lambda x, i: ~F.exists(
            F.col("_ss"), lambda s: (i + 1 >= s) & (i + 1 <= s + (n - 1))
        ),
    )
    return masked.select(
        F.col(id_col),
        F.size("_t").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned"),
    )


def d21_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: repeated-span removal over documents; emits counts
    + md5 of the cleaned text (exact across engines)."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    out = remove_repeated_spans(d)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("cleaned").alias("cleaned_md5"),
    ).orderBy("doc_id")


D21_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(t[i:i + {_N - 1}], ' ')) AS g
  FROM toks, unnest(range(1, greatest(len(t) - {_N - 2}, 1))) AS u(i)
), dup AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc_id) AS ddf FROM grams GROUP BY g
  ) WHERE ddf >= {_MIN_DOCS}
), starts AS (
  SELECT doc_id, list(pos) AS ss FROM grams JOIN dup USING (g) GROUP BY doc_id
), masked AS (
  SELECT toks.doc_id, t, coalesce(ss, []) AS ss
  FROM toks LEFT JOIN starts USING (doc_id)
), kept AS (
  SELECT doc_id, t,
         list_filter(t, (x, i) ->
           len(list_filter(ss, s -> i >= s AND i <= s + {_N - 1})) = 0
         ) AS k
  FROM masked
)
SELECT doc_id, len(t) AS n_tokens,
       len(t) - len(k) AS n_removed,
       -- a fully-removed doc: DuckDB's array_to_string([]) is NULL,
       -- Spark's concat_ws is '' — align on ''
       md5(coalesce(array_to_string(k, ' '), '')) AS cleaned_md5
FROM kept
ORDER BY doc_id
"""

_SELF_N = 4  # within-doc span length (shorter than the cross-doc 8:
# self-repetition shows at smaller n on the ~60-token fixtures)


def d23_selfrep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: within-doc repeated-span removal (keep-first) over
    documents; emits counts + md5 of the cleaned text."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    out = remove_self_repeats(d, n=_SELF_N)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("cleaned").alias("cleaned_md5"),
    ).orderBy("doc_id")


D23_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(t[i:i + {_SELF_N - 1}], ' ')) AS g
  FROM toks, unnest(range(1, greatest(len(t) - {_SELF_N - 2}, 1))) AS u(i)
), starts AS (
  SELECT doc_id, list(pos) AS ss FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY doc_id, g ORDER BY pos) AS rk
    FROM grams
  ) WHERE rk > 1 GROUP BY doc_id
), masked AS (
  SELECT toks.doc_id, t, coalesce(ss, []) AS ss
  FROM toks LEFT JOIN starts USING (doc_id)
), kept AS (
  SELECT doc_id, t,
         list_filter(t, (x, i) ->
           len(list_filter(ss, s -> i >= s AND i <= s + {_SELF_N - 1})) = 0
         ) AS k
  FROM masked
)
SELECT doc_id, len(t) AS n_tokens,
       len(t) - len(k) AS n_removed,
       md5(coalesce(array_to_string(k, ' '), '')) AS cleaned_md5
FROM kept
ORDER BY doc_id
"""

QUERIES = {"d21_span_dedup": d21_span_dedup, "d23_selfrep": d23_selfrep}
# round-9 rotation: individually graded (were composite-delivered in x2;
# the same oracles stay pinned at two SFs in tests/test_span_dedup.py)
ORACLES: dict[str, str] = {
    "d21_span_dedup": D21_ORACLE_SQL,
    "d23_selfrep": D23_ORACLE_SQL,
}
