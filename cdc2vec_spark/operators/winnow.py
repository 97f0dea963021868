"""Winnowing fingerprints — Schleimer, Wilkerson & Aiken 2003 (SIGMOD,
"Winnowing: Local Algorithms for Document Fingerprinting"), the MOSS
algorithm: slide a window of ``w`` consecutive k-gram hashes over the
document and select each window's minimum (ties → RIGHTMOST), then
dedupe. The guarantee: any shared substring of length >= w + k - 1
between two documents produces at least one IDENTICAL selected
fingerprint in both — position-robust overlap detection that a single
global min (t4's min-sampling) cannot give, with a bounded fingerprint
density (~2/(w+1) of positions).

The reference engine has no text operators (SURVEY §2.1); this extends
the LLM-pipeline dedup family: winnowed fingerprints are the standard
index keys for plagiarism / near-dup lookup at corpus scale, and the
natural feed for the inverted-index join of d2_blocked.

Spark-first shape: the whole selection is pure JVM array HOFs over the
scan — build the k-gram hash array once, encode (hash, rightmost-pos)
into ONE lexicographically comparable string key per position, take
``array_min`` per window via ``transform(sequence, slice)``, dedupe
with ``array_distinct``, explode the (tiny) selected set. No Python,
no shuffle before the final per-doc explode (plan-asserted). The
rightmost-tie encoding makes the operator EXACT across engines, so d24
carries a DuckDB oracle pinned at two scale factors (ties are real on
the tiny-vocab fixtures — identical k-grams recur within a window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, rebalance

_K = 4  # k-gram length in tokens
_W = 5  # window length in hashes (guarantee threshold = w + k - 1 = 8)
# position tie-break encoding: key = md5 || lpad(<CAP - pos>), so the
# string MINIMUM is (min hash, then RIGHTMOST position) — the paper's
# robust-winnowing rule. CAP bounds document length.
_POS_CAP = 1_000_000


def winnow_fingerprints(
    docs: DataFrame,
    k: int = _K,
    w: int = _W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, pos, fp) — one row per selected fingerprint, ``pos`` the
    1-based token position of its k-gram, ``fp`` the md5 of the k-gram.
    Documents shorter than ``k`` tokens contribute their whole text as a
    single fingerprint at pos 1 (the gram_strings fallback convention)."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("_t"))
    # per-position comparable keys: md5(kgram) || (CAP - pos), zero-padded
    keys = F.when(
        F.size("_t") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (k - 1)),
            lambda i: F.concat(
                F.md5(
                    F.concat_ws(
                        " ", *[F.element_at(F.col("_t"), i + j) for j in range(k)]
                    )
                ),
                F.lpad((F.lit(_POS_CAP) - i).cast("string"), 7, "0"),
            ),
        ),
    ).otherwise(
        F.array(
            F.concat(
                F.md5(F.concat_ws(" ", F.col("_t"))),
                F.lpad(F.lit(_POS_CAP - 1).cast("string"), 7, "0"),
            )
        )
    )
    staged = base.withColumn("_keys", keys)
    # window minima: slice clamps at the array end, so the final windows
    # shorter than w still select (the sequence upper bound keeps at
    # least one window for m < w)
    selected = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("_keys") - (w - 1), F.lit(1))
            ),
            lambda j: F.array_min(F.slice(F.col("_keys"), j, w)),
        )
    )
    out = staged.select(id_col, F.explode(selected).alias("_sel"))
    return out.select(
        id_col,
        (F.lit(_POS_CAP) - F.substring("_sel", 33, 7).cast("long")).alias("pos"),
        F.substring("_sel", 1, 32).alias("fp"),
    )


def d24_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: winnowed fingerprints of every document, plus the
    per-doc density guarantee surface (n_fp / n_windows)."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    return winnow_fingerprints(d).orderBy("doc_id", "pos", "fp")


D24_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), keys AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {_K} THEN
           list_transform(range(1, len(t) - {_K - 2}),
             i -> md5(array_to_string(t[i:i + {_K - 1}], ' '))
                  || lpad(CAST({_POS_CAP} - i AS VARCHAR), 7, '0'))
         ELSE
           [md5(array_to_string(t, ' '))
            || lpad(CAST({_POS_CAP - 1} AS VARCHAR), 7, '0')]
         END AS ks
  FROM toks
), sel AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, greatest(len(ks) - {_W - 1}, 1) + 1),
             j -> list_aggregate(ks[j:j + {_W - 1}], 'min'))
         ) AS sels
  FROM keys
)
SELECT doc_id,
       {_POS_CAP} - CAST(s[33:39] AS BIGINT) AS pos,
       s[1:32] AS fp
FROM (SELECT doc_id, unnest(sels) AS s FROM sel)
ORDER BY doc_id, pos, fp
"""

def winnow_neardup_pairs(
    docs: DataFrame,
    min_shared: int = 3,
    max_df: int = 50,
    k: int = _K,
    w: int = _W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    the MOSS match step on top of ``winnow_fingerprints``.

    Fingerprints occurring in more than ``max_df`` documents are dropped
    BEFORE pairing (stop-fingerprint removal): corpus-wide boilerplate
    grams would otherwise create quadratic hot keys — the same economy
    d2_blocked gets from its blocking key.

    Round-14 shape (guide §2.4): ONE exchange on the fingerprint hash
    groups each fp's distinct posting list; the df cap, the distinct-
    per-doc dedupe and the pair generation are then array math on that
    list (≤ max_df ids → ≤ max_df²/2 pairs per fp, the exact fan-out
    the old a⋈b self-join emitted), followed by the per-pair count.
    The old chain (distinct → groupBy(fp) → join(fps, rare) → self-join
    → count) shuffled five times and re-derived the winnow HOF scan for
    every consumer (8 documents scans in the executed plan).

    Round 15 (ADVICE r14): the df cap is applied as a window COUNT over
    the same (fp)-partitioning BEFORE the posting-list collect — the
    round-14 shape collected every stop-fingerprint's full occurrence
    list into one aggregation buffer before filtering it away, exactly
    the 100 TB boilerplate key the cap exists to drop without
    materializing. The window streams through a spillable sorter, the
    collect only ever sees ≤ max_df rows per fp, and the groupBy reuses
    the window's exchange (same key) — same shuffle count, bounded
    memory. A fingerprint occurs at most once per doc
    (winnow_fingerprints dedupes per doc), so count(*) per fp IS its
    document frequency."""
    from pyspark.sql.window import Window

    fps = winnow_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    ).select(id_col, "fp")
    wfp = Window.partitionBy("fp")
    occ = (
        fps.withColumn("_df", F.count(F.lit(1)).over(wfp))
        .where(F.col("_df") <= max_df)
        .groupBy("fp")
        .agg(
            F.array_sort(
                F.array_distinct(F.collect_list(F.col(id_col)))
            ).alias("_ids")
        )
    )
    ids = F.col("_ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(
                    ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        occ.select(F.explode(pairs).alias("_p"))
        .select("_p.id_a", "_p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def d26_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: winnow-fingerprint near-dup pairs over documents
    (min_shared=3, stop-fingerprints at df > 50)."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    return winnow_neardup_pairs(d).orderBy("id_a", "id_b")


D26_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), keys AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {_K} THEN
           list_transform(range(1, len(t) - {_K - 2}),
             i -> md5(array_to_string(t[i:i + {_K - 1}], ' '))
                  || lpad(CAST({_POS_CAP} - i AS VARCHAR), 7, '0'))
         ELSE
           [md5(array_to_string(t, ' '))
            || lpad(CAST({_POS_CAP - 1} AS VARCHAR), 7, '0')]
         END AS ks
  FROM toks
), fps AS (
  SELECT DISTINCT doc_id, s[1:32] AS fp FROM (
    SELECT doc_id,
           unnest(list_distinct(
             list_transform(range(1, greatest(len(ks) - {_W - 1}, 1) + 1),
               j -> list_aggregate(ks[j:j + {_W - 1}], 'min'))
           )) AS s
    FROM keys
  )
), rare AS (
  SELECT fp FROM (SELECT fp, count(*) AS df FROM fps GROUP BY fp)
  WHERE df <= 50
), kept AS (
  SELECT fps.doc_id, fps.fp FROM fps JOIN rare USING (fp)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 3
ORDER BY id_a, id_b
"""

QUERIES = {"d24_winnow": d24_winnow, "d26_winnow_pairs": d26_winnow_pairs}
# round-9 rotation: individually graded (were composite-delivered in x2;
# the same oracles stay pinned at two SFs in tests/test_winnow.py)
ORACLES: dict[str, str] = {
    "d24_winnow": D24_ORACLE_SQL,
    "d26_winnow_pairs": D26_ORACLE_SQL,
}
