"""Dedup at ingestion: an incrementally-maintained MinHash-LSH index so
each micro-batch of new documents is near-dup-checked against EVERYTHING
ingested before it — without ever rescanning the corpus.

The batch operators (operators/dedup.py) answer "which pairs in this
corpus are near-dups"; a 100 TB training-data pipeline also needs the
streaming form — "is this incoming doc a near-dup of anything we
already have" — at ingestion time, touching O(batch) state. This module
closes that gap with the engine's bucketed-state machinery:

- ``path/index``  — the banded LSH inverted index: (band, bv, doc_id)
  rows partitioned by ``bucket = pmod(xxhash64(band, bv), n_buckets)``.
  A batch's band keys prune the read to their buckets (the same
  O(batch + touched_buckets × bucket_size) contract as the CDC state
  store).
- ``path/docs``   — (doc_id, sh) shingle-hash sets for exact-Jaccard
  verification, partitioned by ``dbucket = pmod(xxhash64(doc_id),
  n_buckets)`` — read only for the candidate ids' buckets.
- ``path/pairs``  — (round 11, VERDICT r10 ask #5) the ACCUMULATED
  verified near-dup pair set (id_a, id_b, jac), partitioned by
  ``pbucket = pmod(xxhash64(id_a, id_b), n_buckets)``: each batch
  merges only the pair buckets it touched (distinct ∪ prior, per-bucket
  swap — idempotent under replay), so the engine maintains the whole
  near-dup GRAPH incrementally at ingest. The batch graph reports
  (survivors, cluster histogram, leakage split, PageRank, cross-source
  overlap — the d9/d44/d46/d47/d48 family) can then run off this state
  via ``graph_reports()`` in O(pairs + touched) per refresh instead of
  re-deriving shingles → candidates → verification from the corpus —
  the same move c12's IVM made for aggregates.

Per batch: ONE fused Arrow pass computes shingles + signatures
(dedup.shingle_minhash), band keys join against the pruned prior index
(new-vs-old) and self-join within the batch (new-vs-new), exact Jaccard
verifies candidates only, and both state tables merge idempotently
(distinct ∪ prior, per-bucket swap) — replaying a batch emits the same
pairs and leaves state unchanged.

Equivalence: banding is deterministic and a pair sharing a band bucket
is discovered either in the arrival batch of its later doc (new-vs-old)
or within one batch (new-vs-new) — so streaming the corpus in ANY batch
split emits exactly the pairs the batch operator finds on the full
corpus (pinned in tests/test_neardup_stream.py).

Deletes (round 13, VERDICT r12 ask #6): ``delete_batch(ids)`` retires
the ids from all three tables — docs by pruned dbucket rewrite, index
by recomputing the band keys from the stored shingle sets (``sig`` is a
pure function of ``sh``) so the read prunes to exactly the deleted
docs' buckets, pairs by one O(pairs) semi-join locating the affected
pbuckets followed by a pruned anti-join rewrite. The live graph state
and the cadence reports therefore track the SURVIVING corpus; pinned
delete ≡ never-ingested in tests/test_neardup_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.apply import read_bucketed_state, swap_buckets
from ..operators.dedup import (
    _verify_jaccard,
    banded_candidate_pairs,
    shingle_minhash,
)

BUCKET = "bucket"
DBUCKET = "dbucket"
PBUCKET = "pbucket"


class StreamingNearDup:
    """foreachBatch-shaped incremental near-dup filter (see module doc)."""

    def __init__(self, spark: SparkSession, path: str,
                 threshold: float = 0.5, num_perm: int = 64,
                 bands: int = 16, shingle_n: int = 3,
                 n_buckets: int = 64,
                 id_col: str = "doc_id", text_col: str = "text",
                 carry_cols: tuple[str, ...] = ()):
        """``carry_cols`` names extra batch columns (e.g. ``source``) to
        store alongside each doc's shingle set in the docs state — free
        (same write), and it lets ``graph_reports`` compute the
        cross-source contamination matrix from state alone."""
        if num_perm % bands:
            raise ValueError(f"bands {bands} must divide num_perm {num_perm}")
        self.spark = spark
        self.index_path = path.rstrip("/") + "/index"
        self.docs_path = path.rstrip("/") + "/docs"
        self.pairs_path = path.rstrip("/") + "/pairs"
        self.threshold = threshold
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.text_col = text_col
        self.carry_cols = tuple(carry_cols)

    # ------------------------------------------------------------ write

    def _banded(self, sigs: DataFrame) -> DataFrame:
        """(id, sig) → (id, band, bv, bucket) — the same banding as
        dedup.lsh_candidate_pairs, plus the state partition key."""
        rows = self.rows
        banded = sigs.select(
            self.id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at("sig", b * rows + r + 1)
                                    for r in range(rows)
                                ]
                            ).alias("bv"),
                        )
                        for b in range(self.bands)
                    ]
                )
            ).alias("bk"),
        ).select(self.id_col, "bk.band", "bk.bv")
        return banded.withColumn(
            BUCKET, F.pmod(F.xxhash64("band", "bv"), F.lit(self.n_buckets)).cast("int")
        )

    def apply_batch(self, batch: DataFrame, _epoch_id: int | None = None) -> DataFrame:
        """Ingest one batch; returns the verified near-dup pairs it
        surfaced, as (id_a, id_b, jac) with id_a < id_b — new-vs-old and
        new-vs-new alike. Idempotent: a replayed batch returns the same
        pairs and leaves both state tables unchanged."""
        both = shingle_minhash(
            batch.select(self.id_col, self.text_col, *self.carry_cols),
            self.shingle_n, self.num_perm, self.text_col,
        ).persist()
        sigs = both.where(F.col("sig").isNotNull()).select(self.id_col, "sig")
        new_banded = self._banded(sigs).persist()
        touched = sorted(
            r[0] for r in new_banded.select(BUCKET).distinct().collect()
        )
        if not touched:
            new_banded.unpersist()
            both.unpersist()
            return self.spark.createDataFrame(
                [], f"id_a {self._id_type(batch)}, id_b {self._id_type(batch)}, jac double"
            )

        # touched-dir pruned read (read_bucketed_state docstring): only
        # the batch's buckets are ever listed or scanned
        prior_idx = read_bucketed_state(
            self.spark, self.index_path, col=BUCKET, buckets=touched
        )
        cross = None
        if prior_idx is not None:
            old = prior_idx.select(
                "band", "bv", F.col(self.id_col).alias("_old_id")
            )
            cross = (
                new_banded.join(old, ["band", "bv"])
                .where(F.col("_old_id") != F.col(self.id_col))
                .select(
                    F.least(self.id_col, "_old_id").alias("id_a"),
                    F.greatest(self.id_col, "_old_id").alias("id_b"),
                )
                .distinct()
            )
        within = banded_candidate_pairs(
            new_banded.select(self.id_col, "band", "bv"), self.id_col, bv_col="bv"
        )
        cands = within if cross is None else within.unionByName(cross).distinct()

        # shingle sets for verification: the batch's own + the candidate
        # old ids' pruned doc-table buckets
        sh_sources = both.select(self.id_col, "sh")
        if cross is not None:
            cand_ids = cands.select(
                F.explode(F.array("id_a", "id_b")).alias(self.id_col)
            ).distinct()
            dbuckets = sorted(
                r[0]
                for r in cand_ids.select(
                    F.pmod(F.xxhash64(self.id_col), F.lit(self.n_buckets))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            )
            prior_docs = read_bucketed_state(
                self.spark, self.docs_path, col=DBUCKET, buckets=dbuckets
            )
            if prior_docs is not None:
                old_sh = prior_docs.join(
                    cand_ids, self.id_col, "left_semi"
                ).select(self.id_col, "sh")
                sh_sources = sh_sources.unionByName(old_sh).dropDuplicates(
                    [self.id_col]
                )
        pairs = _verify_jaccard(
            cands, sh_sources, self.threshold, self.id_col
        ).localCheckpoint(eager=True)

        # ---- idempotent state merge (distinct ∪ prior, per-bucket swap)
        idx_merged = new_banded
        if prior_idx is not None:
            idx_merged = prior_idx.select(*new_banded.columns).unionByName(
                new_banded
            )
        swap_buckets(
            idx_merged.distinct().repartition(len(touched), BUCKET),
            self.index_path, touched, col=BUCKET,
        )

        new_docs = both.where(F.size("sh") > 0).select(
            self.id_col, "sh", *self.carry_cols
        ).withColumn(
            DBUCKET, F.pmod(F.xxhash64(self.id_col), F.lit(self.n_buckets)).cast("int")
        )
        dtouched = sorted(
            r[0] for r in new_docs.select(DBUCKET).distinct().collect()
        )
        if dtouched:
            docs_merged = new_docs
            prior_docs_all = read_bucketed_state(
                self.spark, self.docs_path, col=DBUCKET, buckets=dtouched
            )
            if prior_docs_all is not None:
                docs_merged = prior_docs_all.select(
                    *new_docs.columns
                ).unionByName(new_docs)
            swap_buckets(
                docs_merged.dropDuplicates([self.id_col]).repartition(
                    len(dtouched), DBUCKET
                ),
                self.docs_path, dtouched, col=DBUCKET,
            )
        new_banded.unpersist()
        both.unpersist()
        self._merge_pairs_state(pairs)
        return pairs

    def delete_batch(self, ids: DataFrame) -> None:
        """Retire a batch of DELETED doc ids from all three state tables
        (round 13, VERDICT r12 ask #6 — the live near-dup graph must
        track the collection when documents are deleted, like every
        other keyed state in the engine):

        - ``docs``:  drop the ids' rows — pruned to their dbucket dirs.
        - ``index``: the ids' (band, bv) rows are found WITHOUT a scan —
          ``sig`` is a pure function of the stored ``sh``
          (minhash_signatures), so the deleted docs' band keys are
          recomputed from the docs state and prune the index read to
          exactly their buckets; an anti-join drops the rows.
        - ``pairs``: pairs referencing a deleted id can live in any
          pbucket (the bucket key is the pair hash), so affected buckets
          are located with one O(pairs) semi-join scan — pairs ≪ corpus
          (it is the near-dup graph, the same frame every report refresh
          already reads) — and only those buckets are rewritten with the
          anti-join.

        Idempotent (anti-joins converge); a delete for a never-ingested
        id is a no-op. Re-ingesting a deleted id later behaves like a
        brand-new doc: its index/docs rows re-merge and new-vs-old
        re-verifies its pairs against the surviving corpus."""
        from ..operators.dedup import minhash_signatures

        dids = ids.select(self.id_col).distinct().localCheckpoint(eager=True)
        dbuckets = sorted(
            r[0]
            for r in dids.select(
                F.pmod(F.xxhash64(self.id_col), F.lit(self.n_buckets))
                .cast("int").alias("b")
            ).distinct().collect()
        )
        if not dbuckets:
            return
        docs = read_bucketed_state(
            self.spark, self.docs_path, col=DBUCKET, buckets=dbuckets
        )
        if docs is not None:
            mine = docs.join(F.broadcast(dids), self.id_col, "left_semi")
            sigs = minhash_signatures(
                mine.select(self.id_col, "sh"), self.num_perm,
                id_col=self.id_col,
            )
            banded = self._banded(sigs)
            ibuckets = sorted(
                r[0] for r in banded.select(BUCKET).distinct().collect()
            )
            if ibuckets:
                idx = read_bucketed_state(
                    self.spark, self.index_path, col=BUCKET, buckets=ibuckets
                )
                if idx is not None:
                    keep_idx = idx.join(
                        F.broadcast(dids), self.id_col, "left_anti"
                    )
                    swap_buckets(
                        keep_idx.repartition(len(ibuckets), BUCKET),
                        self.index_path, ibuckets, col=BUCKET,
                    )
            keep_docs = docs.join(F.broadcast(dids), self.id_col, "left_anti")
            swap_buckets(
                keep_docs.repartition(len(dbuckets), DBUCKET),
                self.docs_path, dbuckets, col=DBUCKET,
            )
        pairs = read_bucketed_state(self.spark, self.pairs_path, col=PBUCKET)
        if pairs is not None:
            da = dids.select(F.col(self.id_col).alias("id_a"))
            db = dids.select(F.col(self.id_col).alias("id_b"))
            hit = (
                pairs.join(F.broadcast(da), "id_a", "left_semi")
                .select(PBUCKET)
                .unionByName(
                    pairs.join(F.broadcast(db), "id_b", "left_semi")
                    .select(PBUCKET)
                )
            )
            pbuckets = sorted(r[0] for r in hit.distinct().collect())
            if pbuckets:
                sub = read_bucketed_state(
                    self.spark, self.pairs_path, col=PBUCKET, buckets=pbuckets
                )
                keep_pairs = (
                    sub.join(F.broadcast(da), "id_a", "left_anti")
                    .join(F.broadcast(db), "id_b", "left_anti")
                )
                swap_buckets(
                    keep_pairs.repartition(len(pbuckets), PBUCKET),
                    self.pairs_path, pbuckets, col=PBUCKET,
                )

    # --------------------------- incremental graph state + reports

    def _merge_pairs_state(self, pairs: DataFrame) -> None:
        """Fold the batch's verified pairs into ``path/pairs`` — the
        same idempotent per-bucket discipline as the index/docs tables:
        only the batch's pair buckets are read or rewritten, distinct on
        the pair key (jac is deterministic, so replays merge to the
        identical row)."""
        new_pairs = pairs.withColumn(
            PBUCKET,
            F.pmod(F.xxhash64("id_a", "id_b"), F.lit(self.n_buckets)).cast("int"),
        )
        ptouched = sorted(
            r[0] for r in new_pairs.select(PBUCKET).distinct().collect()
        )
        if not ptouched:
            return
        merged = new_pairs
        prior = read_bucketed_state(
            self.spark, self.pairs_path, col=PBUCKET, buckets=ptouched
        )
        if prior is not None:
            merged = prior.select(*new_pairs.columns).unionByName(new_pairs)
        swap_buckets(
            merged.dropDuplicates(["id_a", "id_b"]).repartition(
                len(ptouched), PBUCKET
            ),
            self.pairs_path, ptouched, col=PBUCKET,
        )

    def accumulated_pairs(self) -> DataFrame:
        """Every near-dup pair ingested so far — (id_a, id_b, jac),
        id_a < id_b — read from the incrementally maintained pair state
        (no corpus rescan, no candidate re-derivation)."""
        state = read_bucketed_state(self.spark, self.pairs_path, col=PBUCKET)
        if state is None:
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, jac double"
            )
        return state.select("id_a", "id_b", "jac")

    def graph_reports(
        self,
        docs: DataFrame | None = None,
        id_col: str = "doc_id",
        source_col: str = "source",
    ) -> dict[str, DataFrame]:
        """The batch graph-family reports (d9 survivors, d46 cluster
        histogram, d48 leakage split, d44 PageRank, d47 cross-source
        overlap) computed FROM STATE: the pair set is the maintained
        ``path/pairs`` table and the CC labels converge once per call —
        so "the contamination matrix after every batch" costs
        O(pairs + |docs| joins), never a shingle/candidate re-derivation
        (VERDICT r10 ask #5). ``docs`` is the current doc universe with
        ``id_col`` (+ ``source_col`` for the overlap matrix); when None
        (the boot() report-cadence path, round 12) the universe is the
        maintained ``path/docs`` state itself — ids plus the carried
        ``source_col`` if the instance ingests one (``carry_cols``),
        else a single synthetic source."""
        from ..operators.datacard import source_overlap_matrix
        from ..operators.dedup import (
            cluster_size_histogram,
            cluster_split,
            connected_components,
            keep_canonical,
        )
        from ..operators.graph import pagerank

        if docs is None:
            state = read_bucketed_state(self.spark, self.docs_path, col=DBUCKET)
            if state is None:
                raise ValueError("graph_reports: no docs ingested yet")
            src = (
                F.col(source_col)
                if source_col in state.columns
                else F.lit("all").alias(source_col)
            )
            docs = state.select(F.col(self.id_col).alias(id_col), src)
        pairs = self.accumulated_pairs().localCheckpoint(eager=True)
        labels = connected_components(pairs)
        return {
            "survivors": keep_canonical(
                docs, pairs, id_col=id_col, labels=labels
            ).select(id_col).orderBy(id_col),
            "cluster_histogram": cluster_size_histogram(
                docs, pairs, id_col=id_col, labels=labels
            ),
            "split": cluster_split(
                docs, pairs, id_col=id_col, labels=labels
            ),
            "pagerank": pagerank(pairs).withColumnRenamed("id", id_col),
            "source_overlap": source_overlap_matrix(
                docs, pairs, source_col=source_col, id_col=id_col
            ),
        }

    def _id_type(self, df: DataFrame) -> str:
        return next(
            f.dataType.simpleString() for f in df.schema.fields
            if f.name == self.id_col
        )
