"""Object-store-safe state commits: a manifest-generation protocol that
never renames and never overwrites a data object.

``cdc.apply.swap_buckets`` is POSIX-rename based — correct on a local
filesystem, impossible on S3/GCS/ABFS (object stores have no rename; a
"rename" is copy+delete and is not atomic). This module is the standard
object-store answer, the same design Delta Lake / Iceberg commit logs
use, reduced to the engine's bucketed-state needs:

- **Data objects are immutable and uniquely named.** Each commit writes
  its merged buckets to a fresh ``data/commit-<version>-<nonce>/``
  directory (``partitionBy(bucket)`` inside). Nothing ever rewrites or
  renames an existing object — a crashed commit leaves an orphan
  directory that no manifest references and GC later deletes.
- **A commit IS one small manifest object.** ``_manifests/
  manifest-<version>.json`` maps every bucket to the commit directory
  holding its current rows. Object PUTs are atomic, which makes the
  manifest write the commit point: readers see either the old complete
  mapping or the new complete mapping, never a mix. Locally the file is
  written in place WITHOUT any rename — a torn write (crash mid-PUT)
  yields invalid JSON, and readers simply fall back to the newest
  manifest that parses (writers then allocate past the torn version, so
  it is never reused).
- **Readers assemble from the manifest**, grouping buckets by commit
  directory: one pruned parquet read per referenced directory (the
  bucket directory column prunes inside it), unioned. At most
  ``n_buckets`` directories are ever referenced, and GC keeps the tail
  short.

Note on the writer inside a commit directory: Spark's file committer may
use its own task-temp renames while materializing ``data/commit-*/``.
That is irrelevant to this protocol's atomicity — the directory is
unreferenced until the manifest PUT, so even a completely non-atomic
writer (e.g. the S3A magic committer, or plain uploads) is safe; a
half-written directory is just an orphan.

Single-writer by contract (a Structured Streaming query runs one
foreachBatch at a time). Multi-writer would need a conditional-PUT /
external lock on the manifest object — exactly what Delta's S3
LogStore adds — and is out of scope here; the docstring is the fence.

Reference parity: this replaces pipeline.go:44-53's offset-file "commit"
(write-only, no recovery) with a real commit protocol; the bucketed
last-write-wins semantics are identical to ``cdc.apply.ParquetCollection``
(same merge_batch), proven by the equivalence test in
tests/test_manifest.py.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import BUCKET_COL, bucket_expr, eligible_events, merge_batch
from .envelope import OP_DELETE

_MANIFEST_RE = re.compile(r"^manifest-(\d{9})\.json$")


class ManifestStore:
    """The commit protocol alone: versioned bucket→directory mappings over
    immutable commit directories. Knows nothing about merge semantics."""

    def __init__(self, path: str, keep_manifests: int = 10):
        self.path = path
        self.data_root = os.path.join(path, "data")
        self.manifest_root = os.path.join(path, "_manifests")
        self.keep_manifests = keep_manifests

    # -- read side --------------------------------------------------------

    def _versions_on_disk(self) -> list[int]:
        if not os.path.isdir(self.manifest_root):
            return []
        out = []
        for name in os.listdir(self.manifest_root):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest(self) -> tuple[int, dict[int, str], int]:
        """(latest_valid_version, its bucket→dir mapping, max_version_seen).

        Scans manifests newest-first and returns the first that parses —
        a torn/corrupt newest manifest (crash mid-PUT) is skipped, but its
        version number is still reported in max_version_seen so the next
        commit allocates PAST it instead of reusing it."""
        versions = self._versions_on_disk()
        max_seen = versions[-1] if versions else 0
        for v in reversed(versions):
            try:
                with open(self._manifest_path(v), encoding="utf-8") as fh:
                    doc = json.load(fh)
                if doc.get("version") != v:
                    continue
                mapping = {int(k): str(d) for k, d in doc["buckets"].items()}
            except (OSError, ValueError, KeyError):
                continue  # torn write → fall back to the previous manifest
            return v, mapping, max_seen
        return 0, {}, max_seen

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_root, f"manifest-{version:09d}.json")

    def versions(self) -> list[int]:
        """Readable (parseable) retained versions, oldest→newest — the
        time-travel horizon. Bounded by ``keep_manifests`` + gc(): old
        generations age out, exactly like Delta/Iceberg retention."""
        out = []
        for v in self._versions_on_disk():
            try:
                with open(self._manifest_path(v), encoding="utf-8") as fh:
                    if json.load(fh).get("version") == v:
                        out.append(v)
            except (OSError, ValueError):
                continue
        return out

    def at(self, version: int) -> dict[int, str]:
        """The bucket→dir mapping of ONE specific generation — the
        time-travel read point. Unlike latest(), a missing or torn
        manifest here is an ERROR, not a fall-back: silently reading a
        neighboring generation would defeat the point of asking for a
        version (debugging what the state looked like before a bad
        batch)."""
        p = self._manifest_path(version)
        try:
            with open(p, encoding="utf-8") as fh:
                doc = json.load(fh)
            if doc.get("version") != version:
                raise ValueError(f"manifest {p} is torn (version mismatch)")
            return {int(k): str(d) for k, d in doc["buckets"].items()}
        except FileNotFoundError:
            raise ValueError(
                f"version {version} is not retained (kept: {self.versions()}"
                f" — raise keep_manifests to widen the horizon)"
            ) from None
        except (OSError, KeyError) as e:
            raise ValueError(f"manifest {p} unreadable: {e}") from e

    # -- write side -------------------------------------------------------

    def new_commit_dir(self, version: int) -> str:
        """Unique directory name for a commit attempt. The nonce keeps a
        replayed attempt (crash after the data write, before the manifest
        PUT) from colliding with its own orphan."""
        return f"commit-{version:09d}-{uuid.uuid4().hex[:8]}"

    def publish(
        self, version: int, mapping: dict[int, str]
    ) -> None:
        """The commit point: one small JSON object, written in place with
        no rename. On an object store this is a single atomic PUT; locally
        a torn write is tolerated by latest()'s parse-or-fall-back."""
        os.makedirs(self.manifest_root, exist_ok=True)
        doc = {
            "version": version,
            "buckets": {str(b): d for b, d in sorted(mapping.items())},
        }
        with open(self._manifest_path(version), "w", encoding="utf-8") as fh:
            json.dump(doc, fh)
            fh.flush()
            os.fsync(fh.fileno())

    # -- maintenance ------------------------------------------------------

    def gc(self) -> tuple[int, int]:
        """Delete commit directories no manifest ≤ latest references
        anymore and manifests beyond keep_manifests. Returns (dirs,
        manifests) removed. Safe any time under the single-writer
        contract: an orphan directory is by definition unreferenced, and
        readers only follow the manifests that remain."""
        latest_v, mapping, _ = self.latest()
        keep_versions = {
            v for v in self._versions_on_disk() if v <= latest_v
        }
        keep_versions = set(sorted(keep_versions)[-self.keep_manifests :])
        keep_versions.add(latest_v)
        # every directory referenced by a retained, parseable manifest
        live_dirs: set[str] = set()
        for v in keep_versions:
            try:
                with open(self._manifest_path(v), encoding="utf-8") as fh:
                    live_dirs.update(json.load(fh)["buckets"].values())
            except (OSError, ValueError, KeyError):
                continue
        removed_dirs = 0
        if os.path.isdir(self.data_root):
            for name in os.listdir(self.data_root):
                if name not in live_dirs:
                    shutil.rmtree(
                        os.path.join(self.data_root, name), ignore_errors=True
                    )
                    removed_dirs += 1
        removed_manifests = 0
        for v in self._versions_on_disk():
            if v not in keep_versions:
                try:
                    os.remove(self._manifest_path(v))
                    removed_manifests += 1
                except OSError:
                    pass
        return removed_dirs, removed_manifests


def _assemble(
    spark: SparkSession,
    store: ManifestStore,
    buckets: Sequence[int] | None = None,
    as_of: int | None = None,
) -> DataFrame | None:
    """State from the latest manifest (or the ``as_of`` generation —
    time travel over the retained window): buckets grouped by commit
    directory, read as their exact ``bucket=<i>`` partition directories
    (never the whole commit dir — a commit dir can hold stale versions
    of buckets a later commit superseded), unioned. ``buckets`` prunes
    the assembly to just those buckets — the manifest IS the file index,
    so a pruned read lists nothing at all beyond the touched dirs."""
    if as_of is not None:
        mapping = store.at(as_of)
    else:
        _, mapping, _ = store.latest()
    if not mapping:
        return None
    if buckets is not None:
        want = set(buckets)
        mapping = {b: d for b, d in mapping.items() if b in want}
        if not mapping:
            return None
    by_dir: dict[str, list[int]] = {}
    for b, d in mapping.items():
        by_dir.setdefault(d, []).append(b)
    out: DataFrame | None = None
    for d in sorted(by_dir):
        root = os.path.join(store.data_root, d)
        dirs = [
            os.path.join(root, f"{BUCKET_COL}={b}") for b in sorted(by_dir[d])
        ]
        part = spark.read.option("basePath", root).parquet(*dirs)
        out = part if out is None else out.unionByName(part)
    return out


def _commit(
    store: ManifestStore,
    merged: DataFrame,
    touched: Sequence[int],
    auto_gc_every: int,
) -> None:
    """Write the merged touched buckets to a fresh commit dir, publish the
    next manifest, opportunistically GC."""
    _, mapping, max_seen = store.latest()
    version = max_seen + 1  # never reuse a torn version
    cdir = store.new_commit_dir(version)
    # fresh unique directory: errorifexists, no renames, no overwrite
    merged.write.mode("errorifexists").partitionBy(BUCKET_COL).parquet(
        os.path.join(store.data_root, cdir)
    )
    store.publish(version, {**mapping, **{b: cdir for b in touched}})
    if auto_gc_every and version % auto_gc_every == 0:
        store.gc()


class ManifestCollection:
    """`ParquetCollection` semantics over the manifest commit protocol —
    the drop-in for object-store deployments (same merge_batch, same
    bucket pruning, same O(batch + touched_buckets × bucket_size) cost;
    only the commit mechanics differ: immutable commit dirs + manifest
    PUT instead of per-bucket renames)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_cols: Sequence[str] = ("after_title", "after_content"),
        key_cols: Sequence[str] = ("tbl", "pk"),
        n_buckets: int = 64,
        coalesce_unchanged: bool = False,
        keep_manifests: int = 10,
        auto_gc_every: int = 16,
    ):
        self.spark = spark
        self.store = ManifestStore(path, keep_manifests=keep_manifests)
        self.text_cols = tuple(text_cols)
        self.key_cols = tuple(key_cols)
        self.n_buckets = n_buckets
        self.coalesce_unchanged = coalesce_unchanged
        self.auto_gc_every = auto_gc_every

    def read(self, as_of: int | None = None) -> DataFrame | None:
        """Current state, or — with ``as_of`` — the state exactly as of
        that committed generation (time travel over the retained
        manifest window; ``self.store.versions()`` lists the horizon).
        The ops answer to "what did the collection hold before the bad
        batch landed" without restoring anything."""
        return _assemble(self.spark, self.store, as_of=as_of)

    def apply_batch(self, batch: DataFrame, _epoch_id: int | None = None) -> None:
        bexpr = bucket_expr(self.key_cols, self.n_buckets)
        ev = eligible_events(batch, self.text_cols).withColumn(BUCKET_COL, bexpr)
        touched = sorted(
            r[0] for r in ev.select(BUCKET_COL).distinct().collect()
        )  # ≤ n_buckets ints — the one driver round-trip
        if not touched:
            return
        # manifest-pruned read: only the touched buckets' dirs assembled
        prior = _assemble(self.spark, self.store, buckets=touched)
        merged = merge_batch(
            prior,
            batch.withColumn(BUCKET_COL, bexpr),
            self.text_cols,
            key_cols=self.key_cols,
            coalesce_unchanged=self.coalesce_unchanged,
            cluster_col=BUCKET_COL,
            cluster_partitions=len(touched),
        )
        _commit(self.store, merged, touched, self.auto_gc_every)

    def state(self, as_of: int | None = None) -> DataFrame | None:
        """Live rows only (tombstones filtered); ``as_of`` time-travels."""
        df = self.read(as_of=as_of)
        if df is None:
            return None
        return df.where(F.col("op") != OP_DELETE).select(
            "pk", *[c for c in df.columns if c.startswith("after_")]
        )


class ManifestPointsCollection:
    """`runner.PointsCollection` semantics (sink-side points keyed by id,
    max-LSN last-write-wins, delete tombstones) over the manifest commit
    protocol — selected by ``sink.options.state_protocol: manifest`` for
    object-store deployments."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 64,
        keep_manifests: int = 10,
        auto_gc_every: int = 16,
    ):
        self.spark = spark
        self.store = ManifestStore(path, keep_manifests=keep_manifests)
        self.n_buckets = n_buckets
        self.auto_gc_every = auto_gc_every

    def read(self, as_of: int | None = None) -> DataFrame | None:
        return _assemble(self.spark, self.store, as_of=as_of)

    def apply_points(self, pts: DataFrame, _epoch_id: int | None = None) -> None:
        from pyspark.sql.window import Window

        bexpr = bucket_expr(("id",), self.n_buckets)
        cols = ["id", "vector", "metadata", "op", "lsn", BUCKET_COL]
        ev = pts.withColumn(BUCKET_COL, bexpr).select(*cols)
        touched = sorted(r[0] for r in ev.select(BUCKET_COL).distinct().collect())
        if not touched:
            return
        state = _assemble(self.spark, self.store, buckets=touched)
        if state is not None:
            ev = state.select(*cols).unionByName(ev)
        ev = ev.repartition(len(touched), BUCKET_COL)
        w = Window.partitionBy(BUCKET_COL, "id").orderBy(F.col("lsn").desc())
        merged = (
            ev.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        _commit(self.store, merged, touched, self.auto_gc_every)

    def live(self, as_of: int | None = None) -> DataFrame | None:
        df = self.read(as_of=as_of)
        if df is None:
            return None
        return df.where(F.col("op") != OP_DELETE).drop("op", BUCKET_COL)


class ManifestChunkedPointsCollection:
    """`runner.ChunkedPointsCollection` semantics (REPLACE-SET per base
    key: the winning event's whole chunk set, or the single tombstone of
    a winning delete) over the manifest commit protocol — closes the
    round-6 gap where chunked mode required `state_protocol: swap`.
    Buckets hash ``base_id`` so all chunks of a key co-locate, exactly
    like the swap variant."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 64,
        keep_manifests: int = 10,
        auto_gc_every: int = 16,
    ):
        self.spark = spark
        self.store = ManifestStore(path, keep_manifests=keep_manifests)
        self.n_buckets = n_buckets
        self.auto_gc_every = auto_gc_every

    def read(self, as_of: int | None = None) -> DataFrame | None:
        return _assemble(self.spark, self.store, as_of=as_of)

    def apply_points(self, pts: DataFrame, _epoch_id: int | None = None) -> None:
        from pyspark.sql.window import Window

        bexpr = bucket_expr(("base_id",), self.n_buckets)
        cols = ["id", "base_id", "vector", "metadata", "op", "lsn", BUCKET_COL]
        ev = pts.withColumn(BUCKET_COL, bexpr).select(*cols)
        touched = sorted(r[0] for r in ev.select(BUCKET_COL).distinct().collect())
        if not touched:
            return
        state = _assemble(self.spark, self.store, buckets=touched)
        if state is not None:
            ev = state.select(*cols).unionByName(ev)
        ev = ev.repartition(len(touched), BUCKET_COL)
        w = Window.partitionBy(BUCKET_COL, "base_id")
        # replace-set: keep the winning event's rows; dedup exact id
        # replays within it (idempotent re-apply)
        merged = (
            ev.withColumn("_mx", F.max("lsn").over(w))
            .where(F.col("lsn") == F.col("_mx"))
            .drop("_mx")
            .dropDuplicates(["id", "lsn"])
        )
        _commit(self.store, merged, touched, self.auto_gc_every)

    def live(self, as_of: int | None = None) -> DataFrame | None:
        df = self.read(as_of=as_of)
        if df is None:
            return None
        return df.where(F.col("op") != OP_DELETE).drop("op", BUCKET_COL)
