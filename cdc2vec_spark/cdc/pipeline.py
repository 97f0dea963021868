"""The full CDC hot path (SURVEY §3.2) as one composable DataFrame
transformation:

  changes → F1 mapped filter → F2 guards → P1 text concat → P3 id →
  P2 metadata → M1 embed (pandas_udf, batched) → M2 normalize →
  points(id, vector, metadata, op, tbl, pk)

vs. the reference's single-threaded per-row loop (pipeline.go:154-165 →
one HTTP round-trip per row): here every stage is partition-parallel and
the embed stage is Arrow-batched. Deletes short-circuit before the
embedder exactly like pipeline.go:191-196 (their vector is null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig, Mapping
from ..io import rebalance
from ..vector import ops
from . import transform
from .envelope import OP_DELETE


def build_points(
    changes: DataFrame,
    mapping: Mapping,
    provider,
    normalize: bool = True,
    chunk: tuple[int, int] | None = None,
    keep_text: bool = False,
    ingest_filters: tuple = (),
    filter_observations: list | None = None,
    dedupe_embed: bool = False,
) -> DataFrame:
    """Transform a (flattened) change log into sink-ready points.

    ``chunk=(chunk_tokens, stride)`` switches on CHUNKED mode: each
    upsert's text splits into overlapping token windows (the embed/RAG
    primitive — operators.text.chunk_documents) and every chunk becomes
    its own point with id ``<base>#<chunk_id>`` plus a ``base_id``
    column; deletes stay one row with the base id. Chunked points have
    REPLACE-SET semantics per base key (a shorter re-embedded doc must
    drop its stale tail chunks, a delete drops them all) — apply them
    with runner.ChunkedPointsCollection, never the per-id LWW
    collection. Default None: byte-identical to the unchunked pipeline.
    """
    df = transform.filter_mapped(changes, [mapping.table])
    # configured names may be raw table columns (reference YAML: "title")
    # while the log is flattened ("after_title") — resolve against the
    # actual columns; metadata keys stay as configured
    text_cols = [
        transform.resolve_flat_column(c, changes.columns)
        for c in mapping.text_columns
    ]
    df = df.withColumn("text", transform.concat_text(text_cols))
    df = transform.guard_nonempty(df, "text")
    if ingest_filters:
        # configurable quality chain (cdc/filters.py): scrub rewrites
        # text BEFORE embedding; drop rules skip failing upserts with
        # F2 semantics (deletes always pass) — and, placed here, a
        # dropped row never costs an embed call
        from .filters import apply_ingest_filters

        df = apply_ingest_filters(
            df, ingest_filters, observe=filter_observations
        )
    df = df.withColumn("id", transform.derive_key()).withColumn(
        "metadata", transform.metadata_map(mapping, available=changes.columns)
    )
    if chunk is not None:
        df = _chunk_events(df, chunk)
    # M1+M2 fused: L2-normalize inside the embed UDF's Arrow batch when
    # the provider supports it (the vector is already numpy there, so
    # the normalize is free; the Catalyst HOF form — kept as the
    # standalone a7 operator and ops.with_l2_normalized — evaluates
    # interpreted per element and measured 45% of this hot path at dim
    # 768). Output type array<double> matches what the expression form
    # produced.
    # capability flag, not introspection: co_varnames broke silently for
    # **kwargs/non-Python callables and on a parameter rename (r06 ADVICE)
    fused = normalize and getattr(provider, "supports_fused_normalize", False)
    emb = provider.udf(normalize=True) if fused else provider.udf()
    # Delete short-circuit (pipeline.go:191-196): a Python UDF under
    # F.when is still EXECUTED for every row (Spark extracts UDFs out of
    # CASE WHEN and evaluates them unconditionally), so guarding the
    # OUTPUT would not stop deletes from hitting the embedding service.
    # Instead the INPUT is nulled for deletes and providers skip nulls —
    # no HTTP call, vector stays NULL.
    delete_safe_text = F.when(F.col("op") != OP_DELETE, F.col("text"))
    # spread before the embed UDF: a small-file or single-split change log
    # would otherwise pin every embedding call to 1-2 cores (guarded —
    # no shuffle when the log already has >= cores partitions)
    df = rebalance(df)
    # The UDF must land in its own projection: Spark rejects a Python UDF
    # nested inside a higher-order-function lambda, so any downstream
    # expression references the materialized attribute, not the UDF expr.
    if dedupe_embed:
        # dedupe-before-embed (engine extension, opt-in): bulk re-syncs
        # and template rows make batches carry duplicate texts, and a
        # paid/slow HTTP provider should see each distinct text ONCE.
        # Key on md5(text) (joining on long raw texts shuffles the full
        # text twice); deletes have NULL text → NULL key → left join
        # leaves their vector NULL, exactly the short-circuit semantics.
        # Trade: one distinct + one join shuffle per batch against the
        # saved embed calls — leave off for cheap local providers.
        # Nondeterministic providers: duplicates now share one call's
        # vector (a consistency IMPROVEMENT for same-text points).
        keyed = df.withColumn("_tkey", F.md5(delete_safe_text))
        uniq = rebalance(
            keyed.where(F.col("_tkey").isNotNull())
            .select("_tkey", delete_safe_text.alias("_t"))
            .dropDuplicates(["_tkey"])
        )
        vecs = uniq.select("_tkey", emb(F.col("_t")).alias("_raw_vec"))
        df = keyed.join(vecs, "_tkey", "left").drop("_tkey")
    else:
        df = df.withColumn("_raw_vec", emb(delete_safe_text))
    if normalize and not fused:
        df = ops.with_l2_normalized(df, "_raw_vec", "vector")
    else:
        df = df.withColumn("vector", F.col("_raw_vec"))
    out_cols = ["id", "vector", "metadata", "op", "tbl", "pk", "lsn"]
    if chunk is not None:
        out_cols.append("base_id")
    if keep_text:
        # text-consuming sinks (lex_index) need the extracted text; the
        # column rides along and vector-only consumers ignore it
        out_cols.append("text")
    return df.select(*out_cols)


def _chunk_events(df: DataFrame, chunk: tuple[int, int]) -> DataFrame:
    """Explode upsert events into per-chunk events (narrow JVM map, same
    expressions as operators.text.chunk_documents); deletes pass through
    as one base-id row. Every row keeps ``base_id`` so a collection can
    apply replace-set semantics per source key."""
    c, s = chunk
    if not 0 < s <= c:
        raise ValueError(f"need 0 < stride <= chunk_tokens: {s}, {c}")
    # token array materialized in its own projection (round 15): a raw
    # split referenced inside the chunk lambda is re-evaluated per chunk
    # slice — O(tokens²/stride) re-splits per document (same hazard as
    # operators.text.chunk_documents, which already projects _toks)
    toks = F.col("_toks")
    n = F.size(toks)
    k_expr = F.when(n <= c, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - c) / F.lit(float(s))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k_expr - 1),
        lambda k: F.struct(
            k.alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, k * s + 1, c)).alias("chunk_text"),
        ),
    )
    base_cols = [col for col in df.columns if col != "text"]
    ups = (
        df.where(F.col("op") != OP_DELETE)
        .withColumn("_toks", F.split(F.col("text"), " "))
        .select(*base_cols, F.explode(chunks).alias("_c"))
        .select(
            *[c2 for c2 in base_cols if c2 != "id"],
            F.col("id").alias("base_id"),
            F.concat_ws("#", "id", F.col("_c.chunk_id")).alias("id"),
            F.col("_c.chunk_text").alias("text"),
        )
    )
    dels = df.where(F.col("op") == OP_DELETE).select(
        *[c2 for c2 in base_cols if c2 != "id"],
        F.col("id").alias("base_id"),
        F.col("id"),
        F.col("text"),
    )
    return ups.unionByName(dels)


def run_batch(
    changes: DataFrame, config: EngineConfig, provider, keep_text: bool = False,
    filter_observations: list | None = None,
) -> DataFrame:
    """All configured mappings unioned — the whole-engine batch pass.

    ``filter_observations``: see filters.apply_ingest_filters — stage
    names are prefixed with the mapping table when several mappings are
    configured."""
    outs = []
    for m in config.mappings:
        per_map: list | None = None if filter_observations is None else []
        outs.append(build_points(
            changes, m, provider,
            normalize=config.normalize, chunk=config.chunk,
            keep_text=keep_text,
            ingest_filters=getattr(config, "ingest_filters", ()),
            filter_observations=per_map,
            dedupe_embed=getattr(config, "dedupe_embed", False),
        ))
        if per_map:
            prefix = f"{m.table}:" if len(config.mappings) > 1 else ""
            filter_observations.extend(
                (prefix + name, obs) for name, obs in per_map
            )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df
