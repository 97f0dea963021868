"""Embedding-distribution drift detection — the dataset-monitoring
operator every 100 TB training-data pipeline runs between corpus
versions and across slices: "did the embedding distribution of slice X
(or version N+1) move away from the corpus (or version N)?" is the
guard that catches a broken encoder deploy, a crawl-source shift, or a
contaminated slice BEFORE a training run pays for it (the
data-validation practice of Breck et al. 2019, "Data Validation for
Machine Learning", MLSys — their skew/drift comparators over feature
histograms; also Rabanser et al. 2019, "Failing Loudly", NeurIPS, on
two-sample drift detection via dimensionality-reduced histograms).

Distance choice: per-dimension TOTAL VARIATION distance between bucket
histograms, reported in integer basis points. TVD = ½·Σ_b |p_b − q_b|
over quantized buckets is (a) the L1 form every histogram comparator
supports, (b) bounded [0, 1] so "bp over threshold" reads directly, and
(c) — unlike PSI/KL — exactly computable in BIGINT arithmetic: with
raw counts c_b (|A| = N_a) and g_b (|B| = N_b),

    tvd_bp = (Σ_b |c_b·N_b − g_b·N_a| · 5000) div (N_a · N_b)

The cross products c·N reach N_a·N_b, which exceeds int64 once the two
sides' row counts multiply past ~9.2×10¹⁸ (e.g. a 10⁶-row slice against
a 10¹³-row corpus would be fine, but ×5000 head-room dies 4 orders of
magnitude earlier) — so the numerator runs in DECIMAL(38,0) on the
Spark side and HUGEINT (int128) in the DuckDB oracle, both exact
integer arithmetic, and only the final ≤10⁴ quotient is cast back to
BIGINT. ``div`` is integral division in both engines — the d45
integer-anchor discipline: no float crosses the hashed surface.

Rows whose vector is NULL or shorter than ``dims`` are excluded from
BOTH the histograms and the row counts (one explicit filter, mirrored
in the oracle) — otherwise a ragged row would count in N but contribute
nothing to the buckets, silently skewing the normalization (and Spark's
slice() and DuckDB's unnest(generate_series) disagree about what an
out-of-range index produces).

Quantization: bucket = floor(CAST(value AS DOUBLE) · scale). The
float→double widening is exact, scale is a power of two (default 8) so
the multiply is exact, and floor is exact — bit-identical across
engines (the d45_assign_exact precedent, which pinned floor() over
round() for its half-up/half-even portability hazard).

Plan shape (the only big thing is the scan): ONE pass explodes the
first ``dims`` dimensions (dims·|rows| narrow longs), ONE
groupBy(slice, dim, bucket) whose map-side partials collapse to at most
|slices|·dims·|buckets| rows, and everything downstream — global
histogram, slice sizes, the TVD join — is broadcast-sized. No second
scan, no wide shuffle; at 1000 executors the exchange moves a few
thousand counter rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def _bucket_hist(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 8,
    scale: int = 8,
) -> DataFrame:
    """(dim, bucket, c) histogram over the first ``dims`` dimensions —
    bucket = floor(double(x)·scale), one scan, map-side-combined.
    Callers must pre-filter ragged rows with :func:`_well_formed`."""
    return (
        df.select(F.posexplode(F.slice(F.col(vec_col), 1, dims)).alias("dim", "_v"))
        .select(
            "dim",
            F.floor(F.col("_v").cast("double") * scale).cast("long").alias("bucket"),
        )
        .groupBy("dim", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _well_formed(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """Drop NULL/short vectors so histograms and row counts see the same
    population (ADVICE r11: a ragged row counted in N but absent from
    the buckets skews the TVD normalization silently)."""
    return df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) >= dims))


# DECIMAL(38,0) numerator: |c·N − g·N| sums to ≤ 2·N_a·N_b, which ×5000
# overflows int64 once N_a·N_b > ~9.2e14 — real at 100 TB (a 1e6-row
# slice vs a 1e9-row corpus). 38-digit decimal holds ~1e38: safe to
# ~1e17 rows per side. `div` on decimals is integral in Spark.
_TVD_BP = "cast(_num * 5000 div (cast({na} as decimal(38,0)) * {nb}) as long)"


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    dims: int = 8,
    scale: int = 8,
) -> DataFrame:
    """Version-vs-version drift: per-dimension TVD (integer basis
    points) between two frames' embedding distributions — the corpus
    release gate ("alert if any dim's tvd_bp > 500 between v3 and v4").
    Returns (dim, n_a, n_b, tvd_bp). Buckets missing on either side
    contribute their full mass via the outer join's coalesce-to-0."""
    df_a = _well_formed(df_a, vec_col, dims)
    df_b = _well_formed(df_b, vec_col, dims)
    ha = _bucket_hist(df_a, vec_col, dims, scale)
    hb = _bucket_hist(df_b, vec_col, dims, scale)
    na = df_a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = df_b.agg(F.count(F.lit(1)).alias("n_b"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    joined = (
        ha.withColumnRenamed("c", "ca")
        .join(hb.withColumnRenamed("c", "cb"), ["dim", "bucket"], "full_outer")
        .select(
            "dim",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    return (
        joined.groupBy("dim", "n_a", "n_b")
        .agg(F.sum(F.abs(dec("ca") * dec("n_b") - dec("cb") * dec("n_a"))).alias("_num"))
        .select(
            "dim",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(_TVD_BP.format(na="n_a", nb="n_b")).alias("tvd_bp"),
        )
        .orderBy("dim")
    )


def d50_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D50 (added round 11) — the slice-drift report: per (label, dim),
    TVD in basis points between the label slice's bucket histogram and
    the FULL corpus's — "which labeled slices sit away from the corpus
    distribution" (the per-slice skew comparator of Breck et al. 2019
    §4.1; a slice whose encoder broke or whose source shifted lights up
    across dims). All |labels| slices are scored in ONE plan: the slice
    histograms aggregate from one scan, the corpus histogram is their
    re-aggregation (no second scan), and the slice×bucket completion —
    a missing bucket still contributes its corpus mass — is a
    broadcast cross of the |labels| rows against the dims·|buckets|
    global histogram. Output (label, dim, n_rows, tvd_bp), all BIGINT
    ``div`` arithmetic — hash-exact."""
    dims, scale = 8, 8
    e = _well_formed(load_table(spark, sf_dir, "embeddings"), "embedding", dims)
    c = (
        e.select(
            "label",
            F.posexplode(F.slice(F.col("embedding"), 1, dims)).alias("dim", "_v"),
        )
        .select(
            "label",
            "dim",
            F.floor(F.col("_v").cast("double") * scale).cast("long").alias("bucket"),
        )
        .groupBy("label", "dim", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = c.groupBy("dim", "bucket").agg(F.sum("c").alias("gc"))
    nl = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_l"))
    tot = nl.agg(F.sum("n_l").alias("n"))
    full = nl.crossJoin(F.broadcast(g))
    return (
        full.join(c, ["label", "dim", "bucket"], "left")
        .select(
            "label", "dim", "n_l", "gc", F.coalesce("c", F.lit(0)).alias("c0")
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("label", "dim", "n_l", "n")
        .agg(
            F.sum(
                F.abs(
                    F.col("c0").cast("decimal(38,0)") * F.col("n")
                    - F.col("gc").cast("decimal(38,0)") * F.col("n_l")
                )
            ).alias("_num")
        )
        .select(
            "label",
            "dim",
            F.col("n_l").cast("long").alias("n_rows"),
            F.expr(_TVD_BP.format(na="n_l", nb="n")).alias("tvd_bp"),
        )
        .orderBy("label", "dim")
    )


def token_drift(
    old: DataFrame,
    new: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source TOKEN-distribution drift between two corpus versions —
    the lexical twin of :func:`embedding_drift` and the release gate the
    d49 doc-level diff cannot provide ("the doc counts barely moved but
    version N+1's token mix shifted" — a template change, a boilerplate
    source, a truncation bug). TVD over the two versions' per-source
    unigram distributions, in integer basis points with the exact
    DECIMAL(38,0) arithmetic of the d50 comparator (no float crosses the
    hashed surface; HUGEINT in the oracle).

    Plan shape: ONE explode of both sides' tokens (side-tagged union,
    narrow) → ONE map-side-combined groupBy(source, token) → the
    per-source totals re-aggregate from those counter rows (no second
    scan) and broadcast back — the TVD sum is a second counter-row
    aggregate. Vocabulary union is implicit: a token absent on one side
    carries count 0 in its (source, token) row; tokens absent on both
    sides contribute nothing. Sources empty on EITHER side are excluded
    (TVD against an empty distribution is undefined; mirrored in the
    oracle). Returns (source, n_o, n_n, tvd_bp), all BIGINT."""
    def toks(df: DataFrame, side: int) -> DataFrame:
        return df.select(
            F.col(source_col).alias("source"),
            F.lit(side).alias("_s"),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("tok"),
        )

    counts = (
        toks(old, 0)
        .unionByName(toks(new, 1))
        .groupBy("source", "tok")
        .agg(
            F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).alias("c_o"),
            F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("c_n"),
        )
    )
    tot = counts.groupBy("source").agg(
        F.sum("c_o").alias("n_o"), F.sum("c_n").alias("n_n")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return (
        counts.join(F.broadcast(tot), "source")
        .where((F.col("n_o") > 0) & (F.col("n_n") > 0))
        .groupBy("source", "n_o", "n_n")
        .agg(
            F.sum(F.abs(dec("c_o") * dec("n_n") - dec("c_n") * dec("n_o"))).alias(
                "_num"
            )
        )
        .select(
            "source",
            F.col("n_o").cast("long").alias("n_o"),
            F.col("n_n").cast("long").alias("n_n"),
            F.expr(_TVD_BP.format(na="n_o", nb="n_n")).alias("tvd_bp"),
        )
        .orderBy("source")
    )


def d52_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D52 (added round 13) — token drift between the SAME two
    deterministic corpus snapshots d49 diffs at the doc level (old:
    doc_id%7==0 missing, doc_id%5==0 half-truncated; new: doc_id%11==0
    missing), so the two reports read as one release sign-off: d49 says
    WHICH docs moved, d52 says whether the token MIX moved. Hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 7 != 0).select(
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.expr("substr(text, 1, cast(floor(n_chars / 2.0) as int))"),
        ).otherwise(F.col("text")).alias("text"),
    )
    new = d.where(F.col("doc_id") % 11 != 0).select("source", "text")
    return token_drift(old, new)


def ngram_novelty(
    reference: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY of a corpus version against a
    reference release — the third face of the d49/d52 version gate:
    d49 says WHICH docs moved, d52 whether the token MIX moved, this
    says how much genuinely NEW text each doc carries (the memorization
    /freshness signal a training-data refresh wants before paying to
    re-train: a "new" crawl whose docs are 95% old n-grams is recycled
    boilerplate, not new data — the n-gram-overlap lens of the GPT-3
    contamination methodology, Brown et al. 2020 appendix C, pointed at
    novelty instead of leakage).

    For each new-side document: the fraction of its DISTINCT word
    n-grams (``operators/decontam.py:gram_strings`` — the audited d11
    construction, short docs contribute their whole text as one gram so
    every doc has >= 1 gram) absent from the reference side's corpus-
    wide distinct gram set, in integer basis points
    (``novel * 10000 div n_grams`` — the d45 discipline, no float on
    the hashed surface). Returns (id, n_grams, novel_grams,
    novelty_bp), all BIGINT.

    Plan/scale: both sides dedup grams BEFORE their explode (shuffle
    bounded by per-doc vocabulary, not length); the reference set is
    ONE map-side-combined distinct on the 16-byte gram hash — unlike
    d11's broadcast benchmark it is corpus-sized, so membership is a
    co-partitioned shuffle join on ``g`` (at 100 TB: both sides hash-
    partition on the gram hash; bucketing the reference release by
    ``g`` makes refresh scoring shuffle-free on the reference side);
    the per-doc aggregate is the only other exchange."""
    from .decontam import gram_strings

    ref_grams = (
        reference.select(
            F.explode(gram_strings(F.col(text_col), n)).alias("gs")
        )
        .select(F.md5("gs").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    new_grams = new.select(
        F.col(id_col),
        F.explode(gram_strings(F.col(text_col), n)).alias("gs"),
    ).select(id_col, F.md5("gs").alias("g"))
    return (
        new_grams.join(ref_grams, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("novel_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "novel_grams",
            F.expr("novel_grams * 10000 div n_grams")
            .cast("long")
            .alias("novelty_bp"),
        )
        .orderBy(id_col)
    )


def d53_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D53 (added round 14) — per-doc n-gram novelty of the SAME
    deterministic snapshot pair d49/d52 gate (reference: doc_id%7==0
    missing, doc_id%5==0 half-truncated; new: doc_id%11==0 missing), so
    the three reports read as one release sign-off. The truncated
    reference docs make their restored full-text counterparts partially
    novel — exactly the "how much of this refresh is new text" answer.
    Hash-exact.

    rebalance: the fixture is a single parquet split and the gram
    HOF is the expensive stage — same single-split hazard d11 fixed
    (decontam.py:127; measured here: the two gram builds serialized
    onto one core cost the entry 8-15s at sf0.1, ~3s rebalanced)."""
    from ..io import rebalance

    d = rebalance(load_table(spark, sf_dir, "documents"))
    old = d.where(F.col("doc_id") % 7 != 0).select(
        F.when(
            F.col("doc_id") % 5 == 0,
            F.expr("substr(text, 1, cast(floor(n_chars / 2.0) as int))"),
        ).otherwise(F.col("text")).alias("text"),
    )
    new = d.where(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    return ngram_novelty(old, new)


D53_ORACLE_SQL = """
WITH old AS (
  SELECT CASE WHEN doc_id % 5 = 0
              THEN substr(text, 1, CAST(floor(n_chars / 2.0) AS INT))
              ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
),
new AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
),
otoks AS (
  SELECT string_split(lower(text), ' ') AS t, lower(text) AS lt FROM old
),
ogr AS (
  SELECT DISTINCT unnest(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [md5(lt)] END
         ) AS g, 1 AS hit
  FROM otoks
),
ntoks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t, lower(text) AS lt
  FROM new
),
ngr AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [md5(lt)] END
         )) AS g
  FROM ntoks
)
SELECT n.doc_id,
       count(*) AS n_grams,
       count(*) - count(o.hit) AS novel_grams,
       (count(*) - count(o.hit)) * 10000 // count(*) AS novelty_bp
FROM ngr n LEFT JOIN ogr o USING (g)
GROUP BY n.doc_id
ORDER BY n.doc_id
"""


D52_ORACLE_SQL = """
WITH old AS (
  SELECT source,
         CASE WHEN doc_id % 5 = 0
              THEN substr(text, 1, CAST(floor(n_chars / 2.0) AS INT))
              ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
),
new AS (
  SELECT source, text FROM documents WHERE doc_id % 11 <> 0
),
tk AS (
  SELECT source, 0 AS s, unnest(string_split(coalesce(text, ''), ' ')) AS tok
  FROM old
  UNION ALL
  SELECT source, 1 AS s, unnest(string_split(coalesce(text, ''), ' ')) AS tok
  FROM new
),
counts AS (
  SELECT source, tok,
         CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_o,
         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_n
  FROM tk GROUP BY ALL
),
tot AS (
  SELECT source, CAST(sum(c_o) AS BIGINT) AS n_o, CAST(sum(c_n) AS BIGINT) AS n_n
  FROM counts GROUP BY source
)
SELECT c.source AS source, t.n_o AS n_o, t.n_n AS n_n,
       CAST((sum(abs(CAST(c.c_o AS HUGEINT) * t.n_n
                     - CAST(c.c_n AS HUGEINT) * t.n_o)) * 5000)
            // (CAST(t.n_o AS HUGEINT) * t.n_n) AS BIGINT) AS tvd_bp
FROM counts c JOIN tot t USING (source)
WHERE t.n_o > 0 AND t.n_n > 0
GROUP BY c.source, t.n_o, t.n_n ORDER BY c.source
"""


D50_ORACLE_SQL = """
WITH src AS (
  SELECT label, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) >= 8
),
ex AS (
  SELECT label, CAST(i - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 8) AS BIGINT) AS bucket
  FROM src, unnest(generate_series(1, 8)) AS u(i)
),
c AS (SELECT label, dim, bucket, count(*) AS c FROM ex GROUP BY ALL),
g AS (SELECT dim, bucket, CAST(sum(c) AS BIGINT) AS gc FROM c GROUP BY ALL),
nl AS (SELECT label, count(*) AS n_l FROM src GROUP BY label),
tot AS (SELECT count(*) AS n FROM src),
full_grid AS (SELECT nl.label, nl.n_l, g.dim, g.bucket, g.gc FROM nl CROSS JOIN g),
j AS (
  SELECT f.label, f.dim, f.n_l, f.gc, coalesce(c.c, 0) AS c0
  FROM full_grid f
  LEFT JOIN c ON c.label = f.label AND c.dim = f.dim AND c.bucket = f.bucket
)
SELECT label, dim, CAST(n_l AS BIGINT) AS n_rows,
       CAST((sum(abs(CAST(c0 AS HUGEINT) * n - CAST(gc AS HUGEINT) * n_l)) * 5000)
            // (CAST(n_l AS HUGEINT) * n) AS BIGINT) AS tvd_bp
FROM j CROSS JOIN tot
GROUP BY label, dim, n_l, n ORDER BY label, dim
"""


QUERIES = {
    # d50 individually graded since the round-12 rotation; d52 since the
    # round-14 rotation; d53 (round 14) composite-delivered (x4), oracle
    # in tests/test_drift.py — rotation candidate for round 15
    "d50_embedding_drift": d50_embedding_drift,
    "d52_token_drift": d52_token_drift,
    "d53_ngram_novelty": d53_ngram_novelty,
}

ORACLES = {
    "d50_embedding_drift": D50_ORACLE_SQL,
    "d52_token_drift": D52_ORACLE_SQL,
    "d53_ngram_novelty": D53_ORACLE_SQL,
}
