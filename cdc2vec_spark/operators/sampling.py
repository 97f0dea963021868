"""Dataset splitting and sequence packing — the two batching primitives
every LLM training-data pipeline needs between "corpus" and "dataloader".
North-star extensions (BASELINE.json); the reference has nothing here.

- ``train_holdout_split`` — deterministic hash split. Membership is a
  pure function of the key (xxhash64, no RNG, no state), so the split is
  stable across runs, machines, and re-partitioning, and rows added to
  the corpus later NEVER move existing rows between splits — the
  property random splits lose and training pipelines silently break on.
  Pure JVM expression: zero shuffle, evaluated in the scan stage.

- ``pack_sequences`` — greedy first-fit-decreasing bin packing of
  documents into fixed token budgets (sample packing: filling a context
  window with whole short documents instead of padding). Packing is
  inherently sequential, so the corpus is salted into ``n_groups``
  deterministic hash groups and FFD runs per group inside ONE
  applyInPandas pass — each group is a few thousand docs (driver-free,
  one shuffle on the salt), and packing quality is unaffected because
  fill efficiency depends on the doc-length distribution, which every
  hash group shares. Oversized docs (> budget) get a solo pack flagged
  ``overflow`` so the caller can truncate or drop explicitly — packing
  never silently clips.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def train_holdout_split(
    df: DataFrame,
    holdout_frac: float = 0.01,
    key: str = "doc_id",
    out_col: str = "split",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Adds ``split`` ∈ {'train', 'holdout'}: a row is holdout iff
    pmod(xxhash64(key), buckets) < holdout_frac·buckets. Deterministic,
    shuffle-free, append-stable (see module docstring)."""
    if not 0.0 <= holdout_frac <= 1.0:
        raise ValueError(f"holdout_frac must be in [0, 1]: {holdout_frac}")
    cut = int(round(holdout_frac * buckets))
    return df.withColumn(
        out_col,
        F.when(
            F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)) < cut, "holdout"
        ).otherwise("train"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    n_groups: int = 64,
) -> DataFrame:
    """Assign every doc to a pack of total token count ≤ ``budget``.

    Returns (id, n_tokens, pack_id, overflow): ``pack_id`` is
    '<group>/<seq>' — globally unique, deterministic; ``overflow`` marks
    docs longer than the budget (alone in their pack). First-fit-
    decreasing per hash group; within a group the order is (tokens desc,
    id) so packing is reproducible bit-for-bit."""
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if tokens_col is None:
        src = docs.select(
            id_col, F.size(F.split(F.col(text_col), " ")).alias("_ntok")
        )
    else:
        src = docs.select(id_col, F.col(tokens_col).alias("_ntok"))
    src = src.withColumn("_grp", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = int(pdf["_grp"].iloc[0])
        order = np.lexsort((pdf[id_col].to_numpy(), -pdf["_ntok"].to_numpy()))
        ids = pdf[id_col].to_numpy()[order]
        toks = pdf["_ntok"].to_numpy()[order]
        # first-fit-decreasing over open bins (packing is why this is
        # python: it is a sequential loop by nature; each group is small)
        bin_fill: list[int] = []
        assign = np.empty(len(ids), dtype=np.int64)
        overflow = np.zeros(len(ids), dtype=bool)
        for i, t in enumerate(toks):
            if t > budget:
                assign[i] = len(bin_fill)
                bin_fill.append(int(t))
                overflow[i] = True
                continue
            for b, fill in enumerate(bin_fill):
                if fill + t <= budget:
                    assign[i] = b
                    bin_fill[b] += int(t)
                    break
            else:
                assign[i] = len(bin_fill)
                bin_fill.append(int(t))
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": toks,
                "pack_id": [f"{grp}/{b}" for b in assign],
                "overflow": overflow,
            }
        )

    id_type = next(f.dataType.simpleString() for f in src.schema.fields
                   if f.name == id_col)
    return src.groupBy("_grp").applyInPandas(
        pack,
        f"{id_col} {id_type}, n_tokens int, pack_id string, overflow boolean",
    )


def stratified_sample(
    df: DataFrame,
    frac: float,
    strata_cols: tuple[str, ...] = ("source",),
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic proportional stratified sample: within every
    stratum, rank rows by md5 of the key and keep ``ceil(frac · n)`` —
    so each stratum contributes exactly its proportional share (the
    corpus-mixing primitive; plain ``sample()`` drifts per stratum and
    is RNG/partitioning dependent). One shuffle on the strata columns;
    md5 rank (not xxhash64) keeps the operator portable SQL, so the
    exact DuckDB oracle is pinned in tests/test_sampling.py.

    ``ceil`` over the IEEE double product is engine-identical: both
    engines multiply the same doubles, so the (occasionally surprising)
    0.2·35 → 7.000…001 → 8 edge rounds the same way everywhere."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1]: {frac}")
    rank_w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    cnt_w = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rk", F.row_number().over(rank_w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt_w))
        .where(F.col("_rk") <= F.ceil(F.lit(frac) * F.col("_n")))
        .drop("_rk", "_n")
    )


# --- graded rows-only entries (components of x1_rowsonly_pipeline) -------

def d10_split(spark, sf_dir: str) -> DataFrame:
    """Split-membership summary (rows-only: xxhash64 has no DuckDB
    counterpart; determinism + append stability pinned in
    tests/test_sampling.py)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        train_holdout_split(docs, holdout_frac=0.1)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split")
    )


def d14_stratified(spark, sf_dir: str) -> DataFrame:
    """20% proportional sample of documents stratified by source
    (delivered rows-only inside x1; exact DuckDB oracle pinned in
    tests/test_sampling.py at two scale factors)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, 0.2)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


D14_ORACLE_SQL = """
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
) t WHERE rk <= ceil(0.2 * n)
ORDER BY doc_id
"""


def d10_pack(spark, sf_dir: str) -> DataFrame:
    """Full deterministic pack assignment at budget 64 (rows-only: FFD is
    not SQL-expressible; invariants pinned in tests/test_sampling.py)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=64).orderBy("doc_id")


def mix_by_token_budget(
    docs: DataFrame,
    budget,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus mixing (the Dolma/FineWeb re-weighting step):
    per source, keep documents in deterministic md5-rank order until the
    source's token budget is consumed. A doc is kept iff the cumulative
    token count BEFORE it is < the budget, so every non-empty source
    reaches (and the last kept doc may overshoot) its budget — the
    greedy prefix rule, order-stable across runs and partitionings.

    ``budget`` is either a Column expression (evaluated per row — e.g.
    derived from the source name) or a (source, budget) DataFrame, which
    is **broadcast**-joined (budget tables are tiny by construction; the
    corpus side never shuffles for the join).

    Plan shape at 100 TB: one window shuffle on ``source_col`` (the same
    partitioning d14's stratified sampler uses — skewed sources are the
    caller's salting concern, exactly as with any per-stratum window).

    Returns kept rows: (id_col, source_col, n_tokens, cum_tokens).
    """
    n_tok = F.size(F.split(F.col(text_col), " "))
    d = docs.select(F.col(id_col), F.col(source_col), n_tok.alias("n_tokens"))
    if isinstance(budget, DataFrame):
        d = d.join(F.broadcast(budget), source_col)
        budget_col = F.col("budget")
    else:
        budget_col = budget
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        d.where(F.col("cum_tokens") - F.col("n_tokens") < budget_col)
        .select(id_col, source_col, "n_tokens", "cum_tokens")
    )


def d25_token_mix(spark, sf_dir: str) -> DataFrame:
    """Graded entry: mix documents to per-source token budgets derived
    from the source name (400/600/800 by last-digit mod 3 — three real
    budget classes on the fixture's src0..src19)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 400 + 200 * (F.substring("source", -1, 1).cast("int") % 3)
    return mix_by_token_budget(docs, budget).orderBy("doc_id")


D25_ORACLE_SQL = """
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         400 + 200 * (CAST(source[-1] AS INT) % 3) AS budget,
         CAST(sum(len(string_split(text, ' '))) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS cum_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM t WHERE cum_tokens - n_tokens < budget
ORDER BY doc_id
"""


def shard_corpus(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final
    "materialize the training corpus as N shard files" step every
    dataloader expects (fixed shard count, pseudo-random document order,
    reproducible bit-for-bit across runs).

    Each document gets an md5 order key (seeded by a fixed prefix so the
    order is unrelated to d14/d25's rank keys), its shard = first 32
    bits of that key mod ``n_shards`` (balanced in expectation, append-
    stable: new docs never move existing docs between shards), and its
    position within the shard = rank by (key, id).

    Plan shape at 100 TB: ONE hash shuffle on the shard id + a per-shard
    sort — exactly the ``repartition(shard).sortWithinPartitions`` write
    path Spark would execute for ``partitionBy(shard)`` output, with
    shard sizes corpus/n_shards by construction (no skew: md5 is
    uniform). The row_number window keys on the shard, so no global
    single-partition sort exists anywhere.

    Returns (id_col, shard, pos, n_tokens) — the exact write manifest:
    ``pos`` is the document's position inside its shard file, n_tokens
    lets the caller build per-shard token accounting with one aggregate.
    """
    key = F.md5(F.concat_ws(":", F.lit("shard"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    )
    w = Window.partitionBy("shard").orderBy("key", id_col)
    return (
        docs.select(
            F.col(id_col),
            key.alias("key"),
            shard.alias("shard"),
            F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos", "n_tokens")
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Materialize the d29 assignment as actual training shard files:
    ``path/shard=<i>/`` parquet, rows of shard i stored in their
    deterministic pseudo-random order (``pos``), plus a ``_manifest.json``
    with per-shard doc/token counts for the dataloader.

    Plan: the shard_corpus window result repartitioned on the shard id
    and sorted within partitions by pos — Spark's `partitionBy` write
    path with exactly one shuffle. The manifest aggregate rides the
    same frame. At 100 TB this is the standard bulk-write shape; shard
    sizes are corpus/n_shards by md5 uniformity."""
    import json as _json
    import os as _os

    assigned = shard_corpus(docs, n_shards, id_col=id_col, text_col=text_col).join(
        docs.select(id_col, text_col), id_col
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    manifest = {
        str(r["shard"]): {"n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
        for r in assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    }
    with open(_os.path.join(path, "_manifest.json"), "w") as f:
        _json.dump({"n_shards": n_shards, "shards": manifest}, f, indent=1)
    return manifest


def d29_shards(spark, sf_dir: str) -> DataFrame:
    """Graded entry: the full shard assignment at n_shards=8 — every
    document's (shard, pos) placement, hash-checkable end to end."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return shard_corpus(docs, n_shards=8).orderBy("shard", "pos")


D29_ORACLE_SQL = """
WITH t AS (
  SELECT doc_id,
         md5('shard:' || CAST(doc_id AS VARCHAR)) AS key,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos,
       n_tokens
FROM t ORDER BY shard, pos
"""


_WS_BITS = float(2**52)
_WS_SCALE = 1_000_000


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the A-Res
    reservoir scheme (Efraimidis & Spirakis 2006): each row gets key
    u^(1/w) for uniform u, and the k largest keys are an exact weighted
    sample. Here in log form, key = ln(u)/w (monotone equivalent), with
    u derived from md5 (52 bits → the exact mantissa width of a double,
    so ``(v + 0.5) / 2^52`` is bit-identical across engines) and the
    key held as a fixed-point integer (micro-units, the d13 discipline)
    so selection never depends on partitioning, engine, or retry.

    No RNG, no seed state: the sample is a pure function of the ids —
    append-stable (new rows compete, old keys never change) and
    reproducible bit-for-bit, which is what a training-data subsample
    needs. Plan shape: scan-stage key expression + TakeOrderedAndProject
    top-k — zero shuffles, no global sort, nothing driver-side.

    ``weight`` is a Column of positive weights (e.g. token counts for
    length-proportional sampling, or a quality score)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("wsample"), F.col(id_col).cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(_WS_BITS)
    key = (
        F.round(F.log(u) / weight.cast("double") * _WS_SCALE).cast("long")
    )
    return (
        docs.withColumn("key_micro", key)
        .orderBy(F.col("key_micro").desc(), id_col)
        .limit(k)
    )


def d33_weighted_sample(spark, sf_dir: str) -> DataFrame:
    """Graded entry: a 50-doc length-proportional sample (weight = token
    count — longer docs proportionally likelier, the standard
    token-budget-aware subsample)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    return (
        weighted_sample(docs.select("doc_id", n_tok.alias("n_tokens")), 50, F.col("n_tokens"))
        .select("doc_id", "n_tokens", "key_micro")
        .orderBy("doc_id")
    )


D33_ORACLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(round(
           ln((('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
               + 0.5) / {_WS_BITS!r})
           / len(string_split(text, ' ')) * {_WS_SCALE}
         ) AS BIGINT) AS key_micro
  FROM documents
)
SELECT doc_id, n_tokens, key_micro
FROM keyed ORDER BY key_micro DESC, doc_id LIMIT 50
"""


def _round_half_away(x: float) -> int:
    """C++ ``std::round`` semantics for non-negative doubles < 2**52
    (DuckDB's ROUND): half-way cases away from zero, computed on the
    exact fractional part — NOT ``floor(x + 0.5)``, whose addition can
    round up through the boundary (std::round(0.49999999999999994)=0)."""
    import math

    f = math.floor(x)
    r = x - f  # exact for |x| < 2**52
    return int(f) + (1 if r >= 0.5 else 0)


def temperature_mix_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
    budget_tokens: int = 10_000_000,
) -> DataFrame:
    """Temperature-scaled corpus mixing weights — THE multi-source
    pretraining sampling rule (GPT-3 §2.2 / multilingual temperature
    sampling, Arivazhagan 2019): a source's sampling probability is
    proportional to its token count raised to α < 1, which up-weights
    small/high-quality sources relative to raw proportional sampling
    (α=1) without the winner-take-all of uniform (α=0). Complements
    d25's fixed-budget mixing: d25 enforces per-source CAPS, this
    derives the cross-source ALLOCATION those caps should follow.

    The distributed plan is pure integers: one groupBy(source) over
    scan-stage token counts. The α-power normalization runs driver-side
    over the collected |sources|-row aggregate (the pq_train
    bounded-collect pattern) and the fixed-point weights come back as
    literal longs — no floating point ever executes on the cluster, so
    the result cannot drift with the JVM's ``Math.pow``. Driver-side
    arithmetic deterministically matches the DuckDB oracle: CPython's
    ``math.pow`` and DuckDB's ``pow`` are the same libm call, the
    normalizer is a left-to-right sum in source order (the oracle pins
    the same order via ``list_sum(list(w ORDER BY source))``), and
    rounding is half-away-from-zero (``std::round``)."""
    import math

    toks = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
    per = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(toks).cast("long").alias("n_tokens"))
        .collect()
    )  # bounded: one row per corpus source
    rows = sorted(
        [(r["source"], int(r["n_tokens"])) for r in per],
        key=lambda t: (t[0] is None, t[0]),
    )
    pw = [math.pow(n, alpha) for _, n in rows]
    total = 0.0
    for w in pw:  # left-to-right, matching the oracle's list_sum order
        total += w
    out = [
        (
            s,
            n,
            _round_half_away((w / total) * 1_000_000),
            _round_half_away((w / total) * budget_tokens),
        )
        for (s, n), w in zip(rows, pw)
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "source string, n_tokens long, weight_micro long, quota_tokens long"
    ).orderBy("source")


def d37_temperature_mix(spark, sf_dir: str) -> DataFrame:
    """D37 (added round 9) — α=0.7 temperature mixing weights + a 10M-
    token quota allocation over the documents table's sources."""
    from ..io import load_table

    return temperature_mix_weights(load_table(spark, sf_dir, "documents"))


# Engine-exact mirror of the driver-side arithmetic: DuckDB's pow and
# CPython's math.pow are the same libm call; list_sum(list(w ORDER BY
# source)) reproduces the driver's left-to-right source-ordered sum;
# (w / total) * factor reproduces the driver's operation order; DuckDB
# round = std::round = the driver's _round_half_away.
D37_ORACLE_SQL = """
WITH per AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT list_sum(list(pow(n_tokens, 0.7) ORDER BY source)) AS total FROM per
)
SELECT source, n_tokens,
       CAST(round((pow(n_tokens, 0.7) / total) * 1000000) AS BIGINT) AS weight_micro,
       CAST(round((pow(n_tokens, 0.7) / total) * 10000000) AS BIGINT) AS quota_tokens
FROM per, tot ORDER BY source
"""


QUERIES = {
    "d10_split": d10_split,
    "d10_pack": d10_pack,
    "d14_stratified": d14_stratified,
    "d25_token_mix": d25_token_mix,
    "d29_shards": d29_shards,
    "d33_weighted_sample": d33_weighted_sample,
    # round-9 addition: composite-delivered (x1), oracle in
    # tests/test_sampling.py; rotation candidate for round 10
    "d37_temperature_mix": d37_temperature_mix,
}
# round-8 rotation: d25/d29/d33 hold individual graded slots (their
# exact oracles registered here); d14 parked in x4 this round (oracle
# stays pinned in tests/test_rotated_oracles.py); d10_split/d10_pack
# stay rows-only (hash-rank splits / FFD packing are not
# SQL-expressible) and ride inside the x1 composite.
ORACLES = {
    "d14_stratified": D14_ORACLE_SQL,
    "d25_token_mix": D25_ORACLE_SQL,
    "d29_shards": D29_ORACLE_SQL,
    "d33_weighted_sample": D33_ORACLE_SQL,
    "d37_temperature_mix": D37_ORACLE_SQL,
}
