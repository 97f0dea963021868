"""Similarity search over embedding columns — SURVEY §2.2 D3 plus the
scale-path ANN (IVF-Flat, hyperplane LSH) and embedding-cosine near-dup.

Scale design:
- d3 exact top-k: corpus scoring is one narrow BLAS Arrow pass
  (cosine_scores — no join, no shuffle), then TakeOrderedAndProject
  keeps a k-heap per partition and merges on the driver — O(n) work,
  O(k) memory, no global sort. For q queries at once (exact_topk_multi)
  the query matrix ships via sc.broadcast and each batch emits only its
  local per-query top-k (map-side combine) before one O(q·k·partitions)
  merge exchange.
- ivf_topk: IVF-Flat — deterministic centroid subset, centroid matrix
  broadcast, one narrow BLAS pass to assign each vector to its nearest
  centroid (built once, cached/persisted), probe the query's nprobe
  nearest centroids, BLAS rerank inside the probed cells only. The
  disk-resident form (ivf_index_to_disk / ivf_topk_on_disk) partitions
  the index by cell so a probe prunes whole directories.
- cosine near-dup: blocked all-pairs — the blocking key (a label, or a
  hyperplane LSH bucket when no natural key exists) turns O(n²) into
  Σ O(b²) and shuffles co-partitioned blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table, rebalance


def _query_vector(
    embeddings: DataFrame, query_vec_id: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Fetch ONE stored vector to the driver (pushdown-pruned point scan;
    the only collect on the top-k path, O(d) bytes)."""
    row = (
        embeddings.where(F.col(id_col) == query_vec_id).select(vec_col).first()
    )
    if row is None:
        raise ValueError(f"query vector {id_col}={query_vec_id} not found")
    return np.asarray(row[0], dtype=np.float64)


def cosine_scores(
    src: DataFrame,
    qv: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sim=cosine(vec, qv)) for every row — ONE narrow Arrow pass,
    one BLAS matrix-vector product per batch. This replaces the
    interpreted `aggregate` cosine (CodegenFallback, per-element lambda
    steps — the ~100×/pair cost ivf_assign dodged) on the corpus-side
    scoring path. Zero-vector rows (and a zero query) score 0.0, matching
    ops.cosine; the 6-decimal round stays in Spark (F.round) so oracle
    rounding semantics are byte-identical to the expression form."""
    import pandas as pd

    qn = float(np.linalg.norm(qv))
    out_schema = T.StructType(
        [next(f for f in src.schema.fields if f.name == id_col),
         T.StructField("sim", T.DoubleType(), True)]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: pdf[id_col], "sim": []})
                continue
            # np.stack over the Arrow-backed ndarray elements — ~25%
            # cheaper than tolist() (no per-element boxing)
            emat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            en = np.linalg.norm(emat, axis=1)
            denom = en * qn
            denom[denom == 0.0] = np.inf  # zero vector either side → 0.0
            yield pd.DataFrame({id_col: pdf[id_col], "sim": (emat @ qv) / denom})

    return src.select(id_col, vec_col).mapInPandas(score, schema=out_schema)


def exact_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one stored vector (SURVEY §2.2 D3).

    Corpus scoring is the BLAS Arrow pass (cosine_scores) — narrow, NO
    shuffle (a per-query rebalance would round-robin the whole corpus
    through an exchange every call — measured 10× worse than just letting
    the 2 local scan splits do the matmul; at scale the scan already has
    ≥ cores splits); orderBy+limit compiles to TakeOrderedAndProject
    (k-heap per partition, O(k) driver merge), so the plan is
    scan → score → heap at any corpus size. Measured at 50k×768-dim:
    0.67s vs 2.26s for the interpreted `aggregate` cosine form."""
    qv = _query_vector(embeddings, query_vec_id, id_col, vec_col)
    scored = cosine_scores(
        embeddings.where(F.col(id_col) != query_vec_id), qv, id_col, vec_col
    )
    return (
        scored.select(id_col, F.round("sim", 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def d3_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return exact_topk(e, query_vec_id=0, k=10)


def exact_topk_multi(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch kNN: exact cosine top-k for EVERY query row at once — the
    retrieval-pipeline shape (queries in the thousands, corpus in the
    billions).

    The query set is the small side: collected once and shipped via
    ``sc.broadcast`` (the ivf_assign pattern — one torrent copy per
    executor, not a per-task closure). Each Arrow batch then scores ALL
    queries with ONE (batch × d)·(d × q) BLAS matmul and keeps only each
    query's LOCAL top-k — a map-side combine for top-k that bounds the
    Python→JVM fan-out to q·k rows per batch instead of q·batch. The
    final per-query row_number merges the per-batch winners
    (WindowGroupLimit prunes partition-side), so shuffled state is
    O(q·k·partitions), never O(q·n).

    Local selection prunes on UNROUNDED sims with a one-rounding-quantum
    slack margin: every row within 2e-6 of the batch's kth-best sim is
    kept. The global rank orders by F.round(sim, 6) (Java HALF_UP over
    the shortest decimal repr) — no numpy rounding reproduces that
    bit-exactly at half-ULP boundaries (np.round is half-to-even, and
    even a numpy half-up differs through representation error), so
    instead of matching the rounding the prune over-keeps: any row that
    could outrank a kept row under ANY 6-decimal rounding is ≥ 2e-6
    above it and thus kept too (round-5 ADVICE; the margin argument is
    in the inline comment)."""
    import pandas as pd
    from pyspark.sql.window import Window

    qrows = sorted(
        queries.select(query_id_col, query_vec_col).collect(), key=lambda r: r[0]
    )
    spark = embeddings.sparkSession
    out_fields = [
        next(
            f for f in queries.schema.fields if f.name == query_id_col
        ),
        next(f for f in embeddings.schema.fields if f.name == id_col),
        T.StructField("sim", T.DoubleType(), True),
    ]
    out_schema = T.StructType(
        [T.StructField(query_id_col, out_fields[0].dataType), out_fields[1],
         out_fields[2]]
    )
    if not qrows:
        return spark.createDataFrame([], T.StructType(
            list(out_schema.fields) + [T.StructField("rank", T.IntegerType())]
        ))
    qids = [r[0] for r in qrows]
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = np.inf  # zero query → all sims 0
    bc = spark.sparkContext.broadcast((qids, qmat / qn[:, None]))

    def score(batches):
        b_qids, b_qmat_n = bc.value
        nq = len(b_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            emat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            en = np.linalg.norm(emat, axis=1)
            en[en == 0.0] = np.inf
            sims = (emat / en[:, None]) @ b_qmat_n.T  # (batch × q)
            kk = min(k, len(ids))
            out_q, out_i, out_s = [], [], []
            for j in range(nq):
                s = sims[:, j]
                # keep everything within 2e-6 of the kth-best UNROUNDED
                # sim. If a row r is dropped, the >= kk kept rows each
                # exceed r by > 2e-6, so their 6-decimal roundings are
                # strictly greater under any rounding mode (quantum 1e-6
                # + sub-ulp noise < 2e-6) — r can never reach the global
                # top-k regardless of the id tiebreak. Ties cost a few
                # extra rows per batch, never correctness.
                if len(ids) > kk:
                    kth = np.partition(s, -kk)[-kk]
                    keep = np.nonzero(s >= kth - 2e-6)[0]
                else:
                    keep = np.arange(len(ids))
                sel = keep[np.lexsort((ids[keep], -s[keep]))]
                out_q.extend([b_qids[j]] * len(sel))
                out_i.extend(ids[sel])
                out_s.extend(s[sel])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_i, "sim": out_s}
            )

    cand = embeddings.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.round("sim", 6).desc(), F.col(id_col)
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(
            query_id_col, id_col,
            F.round("sim", 6).alias("sim"), F.col("_rn").alias("rank"),
        )
    )


# --- IVF-Flat ANN (scale path) ------------------------------------------

def _deterministic_centroid_ids(embeddings: DataFrame, id_col: str, every: int = 31) -> DataFrame:
    """Centroid subset = ids ≡ 0 (mod `every`) — deterministic, no RNG.
    A production build would run k-means; determinism matters more here
    (oracle/tests), and IVF correctness is independent of centroid
    quality — only recall varies."""
    return embeddings.where(F.col(id_col) % every == 0)


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_cos: bool = False,
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine; ties →
    lowest centroid id). The centroid matrix is collected to the driver,
    row-normalized once, and shipped to executors via ``sc.broadcast`` —
    one torrent-distributed copy per executor, NOT a per-task closure
    pickle (at k-means k ≈ √n, 65k × 768 f64 ≈ 400 MB; re-pickling that
    into every task would dominate the job). Each Arrow batch scores ALL
    centroids with one BLAS matmul + argmax. This is a narrow map — NO
    shuffle, no join: each scan partition emits (id, vec, cell)
    directly. The expression-level alternative (crossJoin + `aggregate`
    cosine) evaluates Catalyst higher-order functions interpreted, per
    element — ~100× slower per pair."""
    cent = sorted(
        centroids.select(id_col, vec_col).collect(), key=lambda r: r[0]
    )
    cids = np.array([r[0] for r in cent], dtype=np.int64)
    cmat = np.array([r[1] for r in cent], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cnorm[cnorm == 0.0] = 1.0  # zero centroid → cosine 0, never argmax-preferred
    bc = embeddings.sparkSession.sparkContext.broadcast((cids, cmat / cnorm))

    src = embeddings.select(id_col, vec_col)
    extra = [T.StructField("cell", T.LongType(), False)]
    if with_cos:
        # ``with_cos=True`` also emits the winning cosine — it is already
        # computed by the matmul below, so callers that need the assigned
        # similarity (d45's report) read it out of THIS Arrow pass instead
        # of re-deriving it with a broadcast join + interpreted HOF dot
        # product (round 14, guide §4.2)
        extra.append(T.StructField("cos", T.DoubleType(), False))
    out_schema = T.StructType(list(src.schema.fields) + extra)

    def assign(batches):
        b_cids, b_cmat_n = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.assign(cell=np.array([], dtype=np.int64))
                if with_cos:
                    out = out.assign(cos=np.array([], dtype=np.float64))
                yield out
                continue
            emat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            enorm = np.linalg.norm(emat, axis=1, keepdims=True)
            enorm[enorm == 0.0] = 1.0
            sims = (emat / enorm) @ b_cmat_n.T
            # argmax takes the FIRST max; cids sorted asc → ties → lowest id
            best = np.argmax(sims, axis=1)
            out = pdf.assign(cell=b_cids[best])
            if with_cos:
                out = out.assign(cos=sims[np.arange(len(best)), best])
            yield out

    return src.mapInPandas(assign, schema=out_schema)


def ivf_build(
    embeddings: DataFrame,
    centroid_every: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index ONCE: (centroids, cell-assigned vectors).
    The assignment is the expensive full pass; callers persist it and
    amortize over every subsequent query — at 100 TB you'd write it out
    partitioned by `cell` so a probe prunes files instead of scanning."""
    cents = _deterministic_centroid_ids(embeddings, id_col, centroid_every)
    return cents, ivf_assign(embeddings, cents, id_col, vec_col)


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 4,
    centroid_every: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: probe the nprobe cells nearest to the
    query, exact-rerank inside them. nprobe = #cells → exact. Pass a
    prebuilt ``index`` (from ivf_build) to skip the assignment pass."""
    cents, assigned = index if index is not None else ivf_build(
        embeddings, centroid_every, id_col, vec_col
    )
    qv = _query_vector(embeddings, query_vec_id, id_col, vec_col)
    # Probe-cell selection is DRIVER-side numpy: the centroid set is tiny
    # by construction (k ≈ √n — the IVF contract; ivf_assign already
    # collects it to broadcast), so scoring it as a Spark job costs a full
    # job round-trip + a Python-worker stage per query for ~√n rows of
    # work. Collapsing probe selection to the driver removes one job and
    # the broadcast join, leaving rerank as ONE isin-filtered scoring
    # pass — this halved the warm d3_ivf_topk query (round-6 probe:
    # tools/probe_ivf.py attributed the r05 2× regression to exactly
    # these per-call mini-job overheads, not to build or cache eviction).
    probe = _probe_cells_driver(cents, qv, nprobe, id_col, vec_col)
    rerank_src = assigned.where(
        F.col("cell").isin(probe) & (F.col(id_col) != query_vec_id)
    )
    return (
        cosine_scores(rerank_src, qv, id_col, vec_col)
        .select(id_col, F.round("sim", 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def _probe_cells_driver(
    cents: DataFrame, qv: np.ndarray, nprobe: int, id_col: str, vec_col: str
) -> list[int]:
    """nprobe nearest centroid ids by cosine, computed driver-side
    (ties → lowest cell id, matching the previous Spark orderBy)."""
    crows = sorted(cents.select(id_col, vec_col).collect(), key=lambda r: r[0])
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cmat = np.array([r[1] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    qn = float(np.linalg.norm(qv))
    denom = cn * qn
    denom[denom == 0.0] = np.inf
    sims = (cmat @ qv) / denom
    order = np.lexsort((cids, -sims))  # sim desc, cell id asc on ties
    return [int(c) for c in cids[order[:nprobe]]]


def ivf_index_to_disk(
    embeddings: DataFrame,
    path: str,
    centroid_every: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as CELL-PARTITIONED parquet — the 100 TB
    layout: `path/cell=<i>/` holds each cell's vectors, `path`_centroids
    the centroid rows. A probe then prunes whole cell directories at
    planning time (PartitionFilters in the scan, zero I/O for unprobed
    cells) instead of filtering a full scan."""
    from ..io import write_partitioned

    cents, assigned = ivf_build(embeddings, centroid_every, id_col, vec_col)
    write_partitioned(assigned, path, "cell")
    cents.select(id_col, vec_col).write.mode("overwrite").parquet(path + "_centroids")


def ivf_topk_on_disk(
    spark: SparkSession,
    path: str,
    qv: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k for an ARBITRARY query vector against a disk-resident
    IVF index (ivf_index_to_disk): score the (tiny) centroid table, pick
    nprobe cells, scan ONLY those cell directories (partition pruning —
    plan-asserted in tests/test_plans.py), BLAS-rerank. The only driver
    round-trip is the nprobe cell ids."""
    qv = np.asarray(qv, dtype=np.float64)
    cents = spark.read.parquet(path + "_centroids")
    # driver-side probe selection (see ivf_topk): one small centroid scan
    # replaces a scoring job + TakeOrdered round-trip per query
    probed = _probe_cells_driver(cents, qv, nprobe, id_col, vec_col)
    cand = spark.read.parquet(path).where(F.col("cell").isin(probed))
    return (
        cosine_scores(cand, qv, id_col, vec_col)
        .select(id_col, F.round("sim", 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


# Build-once index cache, keyed by (spark app, dataset): ANN query cost
# is probe+rerank, not index construction — rebuilding per query would
# misrepresent the operator at any scale. Entries are tiny persisted
# DataFrames (one row per vector: id, vec, cell). Bounded: LRU-evicted
# (unpersisted) beyond _IVF_CACHE_MAX so a long-lived service hopping
# across datasets cannot accumulate pinned executor storage.
_IVF_INDEX_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}
_IVF_CACHE_MAX = 4


def clear_ivf_cache() -> None:
    """Unpersist and drop every cached IVF index (explicit release for
    long-lived processes)."""
    while _IVF_INDEX_CACHE:
        _, (cents, assigned) = _IVF_INDEX_CACHE.popitem()
        cents.unpersist()
        assigned.unpersist()


def d3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN variant of d3. Rows-only oracle (approximate by construction);
    tests/test_similarity.py pins recall and the nprobe=all ≡ exact
    equivalence."""
    e = load_table(spark, sf_dir, "embeddings")
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVF_INDEX_CACHE:
        while len(_IVF_INDEX_CACHE) >= _IVF_CACHE_MAX:  # evict oldest
            oc, oa = _IVF_INDEX_CACHE.pop(next(iter(_IVF_INDEX_CACHE)))
            oc.unpersist()
            oa.unpersist()
        cents, assigned = ivf_build(e)
        _IVF_INDEX_CACHE[key] = (cents.persist(), assigned.persist())
    else:  # LRU refresh
        _IVF_INDEX_CACHE[key] = _IVF_INDEX_CACHE.pop(key)
    return ivf_topk(e, query_vec_id=0, k=10, nprobe=4, index=_IVF_INDEX_CACHE[key])


# --- embedding-cosine near-dup ------------------------------------------

def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Blocked all-pairs cosine near-dup: pairs within a block whose
    cosine ≥ threshold.

    One shuffle on the block key, then each block is a single BLAS
    matmul inside applyInPandas: normalize rows once, S = M·Mᵀ, upper
    triangle, threshold. A pair-expression self-join costs ~100 µs/pair
    in interpreted array lambdas; the matmul does the whole 200-row
    block in well under a millisecond. The blocking key must bound block
    size (that is its job at 100 TB — a block must fit one task); zero
    vectors get sim 0 (ops.cosine semantics)."""
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf[vec_col].to_list()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = np.inf  # zero vector → cosine 0
        mn = m / norms[:, None]
        sims_full = mn @ mn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        sims = np.round(sims_full[ia, ib], 6)
        keep = sims >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "sim": sims[keep]}
        )

    return (
        embeddings.select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(block_pairs, "id_a long, id_b long, sim double")
        .orderBy("id_a", "id_b")
    )


def d8_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(e, threshold=0.3)


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """GLOBAL embedding near-dup without a natural blocking key: the
    hyperplane bucket IS the block. bucket assignment is one narrow BLAS
    pass (hyperplane_buckets), then cosine_neardup_pairs runs its
    per-block matmul with block_col='bucket' — one shuffle on the bucket,
    quadratic work bounded by bucket size (≈ n/2^nbits; raise nbits as n
    grows so buckets stay task-sized). Recall < 1 is inherent (a pair
    split across buckets is missed — by construction such pairs have an
    unfavorable hyperplane margin); precision is exact."""
    bucketed = hyperplane_buckets(embeddings, nbits, None, id_col, vec_col)
    return cosine_neardup_pairs(
        bucketed, threshold, block_col="bucket", id_col=id_col, vec_col=vec_col
    )


def d8_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-blocked global cosine near-dup. Rows-only oracle (bucket
    recall is probabilistic); precision + subset-of-exact pinned in
    tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(e, threshold=0.3, nbits=4)


# --- random-hyperplane LSH bucketing (alternative ANN scale path) -------

def hyperplane_buckets(
    embeddings: DataFrame,
    nbits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SimHash-style bucketing for vectors: bucket = sign bits of dot
    products with `nbits` fixed hyperplanes (md5-seeded, deterministic).
    Candidates for a query = its bucket — at scale, a partition-pruning
    key.

    One narrow mapInPandas: each Arrow batch does a single BLAS matmul
    against the (nbits × dim) plane matrix and packs all sign bits at
    once. The previous expression form (`aggregate` dot per plane per
    row) ran nbits interpreted higher-order functions per row — the
    CodegenFallback pitfall ivf_assign avoids; at 768-dim × 8 bits that
    is ~6k interpreted lambda steps/row vs one vectorized matmul."""
    if dim is None:
        # eager one-row probe — only when the caller can't supply dim
        first = embeddings.select(vec_col).where(F.col(vec_col).isNotNull()).first()
        if first is None:
            raise ValueError("cannot infer vector dim from an empty corpus; pass dim=")
        dim = len(first[0])
    planes = np.empty((nbits, dim), dtype=np.float64)
    for b in range(nbits):
        seed = hashlib.md5(f"plane:{b}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
        planes[b] = rng.standard_normal(dim)
    bit_vals = (np.int64(1) << np.arange(nbits, dtype=np.int64))

    src = embeddings.select(id_col, vec_col)
    out_schema = T.StructType(
        list(src.schema.fields) + [T.StructField("bucket", T.LongType(), False)]
    )

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(bucket=np.array([], dtype=np.int64))
                continue
            emat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pdf.assign(bucket=((emat @ planes.T) > 0.0) @ bit_vals)

    return src.mapInPandas(bucketize, schema=out_schema)


def hyperplane_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nbits: int = 8,
    multiprobe: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidates = vectors whose hyperplane bucket is
    within `multiprobe` bit flips of the query's bucket, exact-reranked.
    Pass `dim` when known — it skips the one-row probe job
    hyperplane_buckets otherwise runs to discover the vector width.

    At scale the bucket column is a partition key, so a probe prunes
    whole file partitions; multiprobe trades recall for probed buckets
    (Σ C(nbits, i) of them). Deterministic planes (md5-seeded) keep
    results reproducible.

    The query row (vector + bucket) is fetched once to the driver, so
    the candidate filter is a LITERAL Hamming predicate on the bucket
    column — no join in the plan at all — and the rerank is the BLAS
    Arrow scorer (cosine_scores) over the filtered candidates."""
    bucketed = hyperplane_buckets(embeddings, nbits, dim, id_col, vec_col)
    qrow = (
        bucketed.where(F.col(id_col) == query_vec_id)
        .select(vec_col, "bucket")
        .first()
    )
    if qrow is None:
        raise ValueError(f"query vector {id_col}={query_vec_id} not found")
    qv = np.asarray(qrow[0], dtype=np.float64)
    hamming = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(int(qrow[1]))))
    cand = bucketed.where(
        (F.col(id_col) != query_vec_id) & (hamming <= multiprobe)
    )
    return (
        cosine_scores(cand, qv, id_col, vec_col)
        .select(id_col, F.round("sim", 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def semdedup(
    embeddings: DataFrame,
    eps: float = 0.3,
    centroid_every: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and pruning near-identical
    points WITHIN each cluster — the trick that makes embedding-space
    dedup tractable at corpus scale, because the quadratic pair work is
    confined to cluster-sized blocks instead of all-pairs.

    Spark-first composition of two existing scale paths:
    - cluster assignment = ``ivf_assign`` (broadcast centroid matrix,
      one narrow BLAS argmax pass, NO shuffle);
    - within-cluster pairs = ``cosine_neardup_pairs`` with the cluster
      id as the blocking key (one shuffle on ``cell``, one BLAS matmul
      per cluster inside applyInPandas).

    Keep rule: deterministic greedy in id order AGAINST THE KEPT SET —
    a point is ``dropped`` iff an already-KEPT lower-id point in its
    cluster has cosine >= eps (round 7: the earlier any-lower-id rule
    was transitive, so a dropped point could lose its only
    representative; greedy-vs-kept is the paper's keep-one-per-group
    semantics, and guarantees every dropped point has a kept neighbor
    within eps). Returns one row per vector: ``(id_col, cell,
    dropped)``. Production use filters ``WHERE NOT dropped``.

    Scale shape unchanged: one narrow broadcast-BLAS assignment pass +
    one shuffle on ``cell``; the greedy runs inside applyInPandas per
    cluster (the blocking key bounds the quadratic work to one task,
    same contract as cosine_neardup_pairs).

    Rows-only by design (cluster assignment is float argmax — not
    SQL-portable at ULP level); pinned in tests/test_similarity.py:
    single-cluster semdedup ≡ the global exact greedy, multi-cluster
    precision + representative-coverage verified against exact cosines,
    determinism.
    """
    import pandas as pd

    cents, assigned = ivf_build(embeddings, centroid_every, id_col, vec_col)

    def cluster_greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        m = np.stack(pdf[vec_col].to_list()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = np.inf  # zero vector → cosine 0
        mn = (m / norms[:, None])[order]
        n = len(ids)
        kept: list[int] = []
        dropped = np.zeros(n, dtype=bool)
        for i in range(n):
            if kept and np.round(mn[kept] @ mn[i], 6).max() >= eps:
                dropped[i] = True
            else:
                kept.append(i)
        return pd.DataFrame(
            {
                id_col: ids[order],
                "cell": pdf["cell"].iloc[0],
                "dropped": dropped,
            }
        )

    return (
        assigned.select("cell", id_col, vec_col)
        .groupBy("cell")
        .applyInPandas(cluster_greedy, f"{id_col} long, cell long, dropped boolean")
        .orderBy(id_col)
    )


def d12_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup as a graded entry (rows-only inside x2_rowsonly_dedup):
    one row per stored vector with its cluster and keep/drop verdict."""
    e = load_table(spark, sf_dir, "embeddings")
    return semdedup(e, eps=0.3)


def semdedup_by_block(
    embeddings: DataFrame,
    eps: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup with PREDEFINED clusters — the degenerate-but-real
    configuration where the blocking key is a metadata column (tenant,
    shard, label) instead of learned centroids. Same keep rule as
    ``semdedup`` (greedy in id order against the KEPT set), but because
    the float surface reduces to ``cosine_neardup_pairs`` (the
    hash-checked d8 form) and the greedy itself is pure integer/set
    logic, the WHOLE operator is oracle-exact — this is the semantic-
    dedup path's hash-checked anchor (VERDICT r09 ask #7, the
    d2_lsh_exact pattern).

    Shape: one pair pass (one shuffle on the block, per-block BLAS) +
    one cogrouped greedy per block (set logic over the block's pair
    list — quadratic work stays bounded by the block, exactly like the
    centroid form). Returns ``(id_col, block_col, dropped)``."""
    import pandas as pd

    pairs = cosine_neardup_pairs(
        embeddings, eps, block_col=block_col, id_col=id_col, vec_col=vec_col
    )
    ids = embeddings.select(block_col, id_col)
    # pairs are within-block by construction; recover the block via the
    # lower id (both ends share it). The block rides under a private
    # name on this side — ids and pl share lineage, and cogroup keys
    # match positionally, so the rename also defuses the ambiguous-
    # self-join check.
    pl = pairs.join(
        ids.select(
            F.col(id_col).alias("id_a"), F.col(block_col).alias("_blk")
        ),
        "id_a",
    )
    id_field = next(f for f in ids.schema.fields if f.name == id_col)
    blk_field = next(f for f in ids.schema.fields if f.name == block_col)
    out_schema = T.StructType(
        [id_field, blk_field, T.StructField("dropped", T.BooleanType(), False)]
    )

    def block_greedy(key, ids_pdf, pairs_pdf) -> pd.DataFrame:
        order = sorted(ids_pdf[id_col].to_list())
        nbrs: dict = {}
        for a, b in zip(pairs_pdf["id_a"], pairs_pdf["id_b"]):
            nbrs.setdefault(b, set()).add(a)
        kept: set = set()
        dropped = []
        for i in order:
            if nbrs.get(i, set()) & kept:
                dropped.append(True)
            else:
                kept.add(i)
                dropped.append(False)
        return pd.DataFrame(
            {id_col: order, block_col: [key[0]] * len(order), "dropped": dropped}
        )

    return (
        ids.groupBy(block_col)
        .cogroup(pl.groupBy("_blk"))
        .applyInPandas(block_greedy, out_schema)
        .orderBy(id_col)
    )


def d12_semdedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked SemDeDup anchor: predefined-cluster (label-blocked)
    semantic dedup at eps=0.3 — float surface ≡ the d8 graded pair form,
    greedy ≡ exact set logic, mirrored in SQL by a recursive CTE."""
    e = load_table(spark, sf_dir, "embeddings")
    return semdedup_by_block(e, eps=0.3)


def d3_multi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN as a graded entry: exact top-5 (self-match included) for
    the 10 lowest-id stored vectors at once — the retrieval-pipeline
    shape (broadcast query set, WindowGroupLimit per query), hash-checked
    against a DuckDB window-function oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return exact_topk_multi(e, qs, k=5).orderBy("query_id", "rank")


def d3_hyperplane_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN as a graded entry (rows-only: approximate by
    construction; recall pinned vs exact in tests/test_similarity.py).
    nbits=4 keeps every bucket populated at sf0.01's 200-vector corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    return hyperplane_topk(e, query_vec_id=0, k=10, nbits=4, multiprobe=1)


_D3_MULTI_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))), 6) AS sim
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""

_D3_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, sim FROM (
  SELECT e.vec_id,
         round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))), 6) AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
) t ORDER BY sim DESC, vec_id LIMIT 10
"""

def semantic_decontaminate(
    embeddings: DataFrame,
    is_benchmark,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of d11's n-gram overlap (n-grams miss paraphrased or
    translated eval leakage; embedding cosine does not). Every
    non-benchmark vector is scored with its maximum cosine against the
    benchmark slice; ``contaminated`` = max_sim ≥ threshold, and the
    winning benchmark id is reported for audit (ties break to the
    smallest benchmark id — deterministic, engine-portable).

    Scale shape (the d11 stance, vector-ized): eval suites are MBs by
    construction, so the benchmark matrix is collected once (bounded)
    and closure-shipped; scoring is ONE narrow Arrow `mapInPandas` BLAS
    pass over the train side — no join, no shuffle, 100 TB of train
    embeddings stream through at scan throughput. Cosine rounded to 6
    decimals = the d8 precedent that hash-matches DuckDB's
    list_dot_product oracle exactly."""
    import pandas as pd

    bench_rows = (
        embeddings.where(is_benchmark)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    if not bench_rows:
        raise ValueError("empty benchmark slice")
    bench_ids = np.asarray([r[id_col] for r in bench_rows], dtype=np.int64)
    bm = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in bench_rows])
    bnorm = np.linalg.norm(bm, axis=1)
    bnorm[bnorm == 0] = np.inf
    bmn = bm / bnorm[:, None]

    out_schema = (
        f"{id_col} long, best_bench_id long, max_sim double, contaminated boolean"
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_list()).astype(np.float64)
            mnorm = np.linalg.norm(m, axis=1)
            mnorm[mnorm == 0] = np.inf
            sims = np.round((m / mnorm[:, None]) @ bmn.T, 6)
            best = sims.max(axis=1)
            # first max in ascending-id benchmark order = smallest id
            arg = np.argmax(sims == best[:, None], axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "best_bench_id": bench_ids[arg],
                    "max_sim": best,
                    "contaminated": best >= threshold,
                }
            )

    return (
        embeddings.where(~is_benchmark)
        .select(id_col, vec_col)
        .mapInPandas(score, out_schema)
        .orderBy(id_col)
    )


def d34_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entry: the vec_id % 29 slice is the benchmark (the d11
    convention), every other embedding is scored against it."""
    e = rebalance(load_table(spark, sf_dir, "embeddings"))
    return semantic_decontaminate(e, F.col("vec_id") % 29 == 0)


_D34_ORACLE = """
SELECT vec_id, best_bench_id, max_sim, contaminated FROM (
  SELECT t.vec_id, b.vec_id AS best_bench_id,
         round(list_dot_product(CAST(t.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(t.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS max_sim,
         round(list_dot_product(CAST(t.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(t.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) >= 0.4 AS contaminated,
         row_number() OVER (
           PARTITION BY t.vec_id
           ORDER BY round(list_dot_product(CAST(t.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(t.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings t JOIN embeddings b
    ON t.vec_id % 29 != 0 AND b.vec_id % 29 = 0
) x WHERE rn = 1 ORDER BY vec_id
"""


_D8_ORACLE = """
SELECT id_a, id_b, sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
) t WHERE sim >= 0.3 ORDER BY id_a, id_b
"""

# the d8 pair form at eps=0.3 feeding a recursive-CTE greedy: walk ids
# ascending, drop iff a KEPT lower-id same-label neighbor exists — pure
# set logic after the (d8-proven) float pass, so the anchor hash-checks
# the semantic-dedup keep rule end to end. The recursion is global in
# vec_id order, which equals the per-label greedy because neighbor
# lists never cross labels.
_D12_EXACT_ORACLE = """
WITH RECURSIVE
p AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  ) t WHERE sim >= 0.3
),
nb AS (SELECT id_b, list(id_a) AS nbrs FROM p GROUP BY id_b),
ids AS (
  SELECT vec_id, label, row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings
),
ids2 AS (
  SELECT i.vec_id, i.rn, coalesce(nb.nbrs, CAST([] AS BIGINT[])) AS nbrs
  FROM ids i LEFT JOIN nb ON nb.id_b = i.vec_id
),
g AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS kept
  UNION ALL
  SELECT i.rn,
         CASE WHEN len(list_intersect(i.nbrs, g.kept)) > 0 THEN g.kept
              ELSE list_append(g.kept, i.vec_id) END
  FROM g JOIN ids2 i ON i.rn = g.rn + 1
)
SELECT i.vec_id, i.label,
       NOT list_contains(k.kept, i.vec_id) AS dropped
FROM ids i, (SELECT kept FROM g ORDER BY rn DESC LIMIT 1) k
ORDER BY i.vec_id
"""

QUERIES = {
    "d3_exact_topk": d3_exact_topk,
    "d3_ivf_topk": d3_ivf_topk,
    "d3_multi_topk": d3_multi_topk,
    "d3_hyperplane_topk": d3_hyperplane_topk,
    "d8_cosine_neardup": d8_cosine_neardup,
    "d8_lsh_neardup": d8_lsh_neardup,
    "d12_semdedup": d12_semdedup,
    # round-10 addition (VERDICT r09 ask #7): the hash-checked anchor for
    # the semantic-dedup keep rule; composite-delivered in x2 under the
    # 50-entry budget, oracle pinned at two SFs in tests/test_similarity.py
    "d12_semdedup_exact": d12_semdedup_exact,
    "d34_semantic_decontam": d34_semantic_decontam,
}

ORACLES = {
    "d3_exact_topk": _D3_ORACLE,
    "d3_multi_topk": _D3_MULTI_ORACLE,
    # d3_ivf_topk, d3_hyperplane_topk: rows-only (approximate; pinned by
    # tests/test_similarity.py)
    "d8_cosine_neardup": _D8_ORACLE,
    # round-10 addition: the semantic-dedup hash-checked anchor
    "d12_semdedup_exact": _D12_EXACT_ORACLE,
    # round-8 rotation: individually graded (was composite-delivered)
    "d34_semantic_decontam": _D34_ORACLE,
}
