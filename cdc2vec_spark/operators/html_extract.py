"""HTML → text extraction with boilerplate removal — the CommonCrawl
ingestion step (WET-style tag stripping + a jusText/trafilatura-class
segment heuristic: Pomikálek 2011, Barbaresi 2021).

Every web-scale pretraining corpus starts from markup, not text: strip
script/style, split the page into block-level segments, drop
boilerplate segments (nav/footer/link lists — short, low-word-count
blocks), unescape entities, normalize whitespace. The reference engine
has nothing like it (SURVEY §2.1); this is the missing FRONT of the
corpus pipeline whose later stages (lang-id → quality → dedup →
decontaminate → mix → split → shard) are d4/t2/d1/d11/d25/d10/d29.

Spark-first, sized for 100 TB of raw HTML:

- the whole extractor is scan-stage JVM expressions — regexp_replace /
  split / transform / filter / array_join; no Python, no join, no
  aggregate, no shuffle (plan-asserted). It runs at scan throughput and
  composes with any downstream operator in the same stage;
- regexes are ASCII-anchored and flag-free (``[^<]*`` instead of
  dot-all lazy quantifiers) so Java regex (Spark) and RE2 (DuckDB)
  agree byte-for-byte — the d20 PII discipline;
- entity unescaping is a fixed replace chain with ``&amp;`` LAST so
  double-escaped input cannot double-unescape.

The fixture corpus is plain text, so the graded query synthesizes a
deterministic HTML page per document (title + nav list + the document
body as ``<p>`` + an entity-bearing content block + footer) and then
extracts it — the same pattern d20 uses for synthesized PII. The
oracle replicates BOTH synthesis and extraction in DuckDB SQL, so the
round trip (body survives, boilerplate does not, entities decode) is
hash-checked end to end; pinned at two SFs in tests/test_html.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# block-level boundaries that end a text segment
_BLOCK_SPLIT = "</p>|</div>|</li>|</h1>|</title>"
_MIN_WORDS = 4  # segments with fewer words are boilerplate (nav/footer)


def _unescape(col: Column) -> Column:
    """Fixed HTML entity set; &amp; last so &amp;lt; → &lt;, not <."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    min_words: int = _MIN_WORDS,
) -> DataFrame:
    """Adds ``clean_text`` (the extracted content), ``n_segments``
    (block segments seen) and ``n_kept`` (segments surviving the
    boilerplate rule: ≥ min_words whitespace words after tag strip).

    Pure scan-stage expression — see module docstring.
    """
    # 1. drop script/style payloads (flag-free: content has no '<')
    no_code = F.regexp_replace(
        F.col(html_col), "<script[^>]*>[^<]*</script>|<style[^>]*>[^<]*</style>", " "
    )
    # 2. block segmentation
    segs = F.split(no_code, _BLOCK_SPLIT)
    # 3. per segment: strip tags, unescape, normalize whitespace
    cleaned = F.transform(
        segs,
        lambda s: F.trim(
            F.regexp_replace(
                _unescape(F.regexp_replace(s, "<[^>]*>", " ")), "  *", " "
            )
        ),
    )
    # 4. boilerplate rule: keep segments with >= min_words words.
    # The cleaned/kept segment arrays are materialized ONCE each in
    # their own projections (round 15): referenced directly from
    # withColumns, the full tag-strip + unescape regex pipeline ran
    # three times per row (clean_text via kept, n_segments, n_kept —
    # interpreted HOFs have no common-subexpression cache).
    kept = F.filter(
        F.col("_segs"), lambda s: F.size(F.split(s, " ")) >= F.lit(min_words)
    )
    return (
        df.withColumn("_segs", cleaned)
        .withColumn("_kept", kept)
        .withColumns(
            {
                "clean_text": F.array_join("_kept", " "),
                "n_segments": F.size("_segs").cast("long"),
                "n_kept": F.size("_kept").cast("long"),
            }
        )
        .drop("_segs", "_kept")
    )


def synthesize_page(doc_id: Column, text: Column) -> Column:
    """Deterministic HTML page wrapping a document (the d20 synthesized-
    fixture pattern): title, style block, nav list (boilerplate), the
    body as ``<p>``, an entity-bearing content block, short footer."""
    return F.concat(
        F.lit("<html><head><title>Doc "),
        doc_id.cast("string"),
        F.lit("</title><style>p { margin: 0; }</style></head><body>"),
        F.lit('<ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul>'),
        F.lit("<p>"),
        text,
        F.lit("</p>"),
        F.lit("<p>Extra block: Tom &amp; Jerry say &quot;hi&quot; &lt;here&gt;</p>"),
        F.lit("<div>Copyright 2024</div></body></html>"),
    )


def d30_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: synthesize a page per document, extract it, and
    return the extraction plus the round-trip verdict (body must
    survive word-for-word ahead of the entity block; nav/footer/title
    must not)."""
    d = load_table(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id", "text", synthesize_page(F.col("doc_id"), F.col("text")).alias("html")
    )
    out = extract_text(pages)
    return out.select(
        "doc_id",
        "clean_text",
        "n_segments",
        "n_kept",
        F.col("clean_text").startswith(F.col("text")).alias("body_first"),
    ).orderBy("doc_id")


D30_ORACLE_SQL = f"""
WITH pages AS (
  SELECT doc_id, text,
         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><style>p {{ margin: 0; }}</style></head><body>'
         || '<ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul>'
         || '<p>' || text || '</p>'
         || '<p>Extra block: Tom &amp; Jerry say &quot;hi&quot; &lt;here&gt;</p>'
         || '<div>Copyright 2024</div></body></html>' AS html
  FROM documents
), segs AS (
  SELECT doc_id, text,
         regexp_split_to_array(
           regexp_replace(html,
             '<script[^>]*>[^<]*</script>|<style[^>]*>[^<]*</style>', ' ', 'g'),
           '{_BLOCK_SPLIT}') AS raw
  FROM pages
), cleaned AS (
  SELECT doc_id, text,
         list_transform(raw, s -> trim(
           regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(s, '<[^>]*>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
             '  *', ' ', 'g'))) AS segs
  FROM segs
), kept AS (
  SELECT doc_id, text, segs,
         list_filter(segs, s -> len(string_split(s, ' ')) >= {_MIN_WORDS}) AS keep
  FROM cleaned
)
SELECT doc_id,
       coalesce(array_to_string(keep, ' '), '') AS clean_text,
       CAST(len(segs) AS BIGINT) AS n_segments,
       CAST(len(keep) AS BIGINT) AS n_kept,
       starts_with(coalesce(array_to_string(keep, ' '), ''), text) AS body_first
FROM kept ORDER BY doc_id
"""

QUERIES = {"d30_html_extract": d30_html_extract}
ORACLES = {"d30_html_extract": D30_ORACLE_SQL}
