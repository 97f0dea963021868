"""CDC apply semantics: last-write-wins, skip-empty, delete routing,
batch merge idempotence, and incremental == batch (SURVEY §2.2 A6/C6)."""

import pytest

from pyspark.sql import functions as F

from cdc2vec_spark.cdc import apply
from cdc2vec_spark.cdc.changelog import MAPPED, changes_df
from cdc2vec_spark.cdc.transform import filter_mapped

SCHEMA = (
    "lsn long, op string, tbl string, pk string, "
    "after_title string, after_content string, after_author string"
)


def _log(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_last_write_wins(spark):
    log = _log(
        spark,
        [
            (1, "c", "t", "1", "v1", "c", "a"),
            (2, "u", "t", "1", "v2", "c", "a"),
            (3, "c", "t", "2", "x", "y", "b"),
        ],
    )
    out = {r["pk"]: r["after_title"] for r in apply.latest_state(log).collect()}
    assert out == {"1": "v2", "2": "x"}


def test_delete_wins(spark):
    log = _log(spark, [(1, "c", "t", "1", "v", "c", "a"), (2, "d", "t", "1", None, None, None)])
    assert apply.latest_state(log).count() == 0


def test_delete_then_reinsert(spark):
    log = _log(
        spark,
        [
            (1, "c", "t", "1", "old", "c", "a"),
            (2, "d", "t", "1", None, None, None),
            (3, "c", "t", "1", "new", "c", "a"),
        ],
    )
    rows = apply.latest_state(log).collect()
    assert len(rows) == 1 and rows[0]["after_title"] == "new"


def test_empty_text_update_skipped_keeps_prior(spark):
    # pipeline.go:204-208: an empty-text upsert never reaches the sink,
    # so the previous state survives — the subtle reference semantic.
    log = _log(
        spark,
        [(1, "c", "t", "1", "keep", "c", "a"), (2, "u", "t", "1", "", None, "a")],
    )
    rows = apply.latest_state(log).collect()
    assert len(rows) == 1 and rows[0]["after_title"] == "keep"


def test_merge_batch_idempotent_replay(spark):
    b1 = _log(spark, [(1, "c", "t", "1", "v1", "c", "a")])
    b2 = _log(spark, [(2, "u", "t", "1", "v2", "c", "a")])
    s1 = apply.merge_batch(None, b1)
    s2 = apply.merge_batch(s1, b2)
    s2_replay = apply.merge_batch(s2, b2)  # replay after restart
    assert [(r["pk"], r["after_title"]) for r in s2_replay.collect()] == [("1", "v2")]
    # stale batch replay cannot regress state (max-LSN guard)
    s2_stale = apply.merge_batch(s2, b1)
    assert [(r["pk"], r["after_title"]) for r in s2_stale.collect()] == [("1", "v2")]


@pytest.mark.slow
def test_incremental_equals_batch_on_fixture(spark, sf_dir, tmp_path):
    """Split the derived changelog into 3 LSN-ordered batches, apply via
    ParquetCollection, compare with the one-shot latest_state answer."""
    ch = filter_mapped(changes_df(spark, sf_dir), MAPPED).cache()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // 3 + 1
    coll = apply.ParquetCollection(spark, str(tmp_path / "state"))
    for i in range(3):
        batch = ch.where(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        coll.apply_batch(batch)
    got = sorted(
        (r["pk"], r["after_title"], r["after_content"]) for r in coll.state().collect()
    )
    want = sorted(
        (r["pk"], r["after_title"], r["after_content"])
        for r in apply.latest_state(ch).collect()
    )
    assert got == want and len(got) > 0


def test_swap_write_crash_recovery(spark, tmp_path):
    """A crash between the two renames leaves only <path>.old; read_state
    must recover the pre-batch state instead of silently returning None."""
    import os

    path = str(tmp_path / "state")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    apply.swap_write(df, path)
    # simulate the crash window: state renamed away, new state never promoted
    os.rename(path, path + ".old")
    recovered = apply.read_state(spark, path)
    assert recovered is not None
    assert [(r["id"], r["v"]) for r in recovered.collect()] == [(1, "a")]
    assert os.path.exists(path) and not os.path.exists(path + ".old")


def _bucket_snapshot(path):
    """(bucket dir → sorted data-file names+sizes) map for change detection."""
    import os

    out = {}
    for name in sorted(os.listdir(path)):
        if not name.startswith("bucket="):
            continue
        d = os.path.join(path, name)
        out[name] = sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        )
    return out


def test_apply_batch_rewrites_only_touched_buckets(spark, tmp_path):
    """The O(batch) claim, verified structurally: a 2-key batch against a
    1000-key state must leave every untouched bucket directory's data
    files byte-identical (same names — Spark part-file names are
    write-specific UUIDs, so an untouched name proves an untouched file)
    and rewrite only the buckets the 2 keys hash into."""
    path = str(tmp_path / "state")
    coll = apply.ParquetCollection(spark, path, n_buckets=16)
    big = spark.range(1000).select(
        F.col("id").alias("lsn"),
        F.lit("c").alias("op"),
        F.lit("t").alias("tbl"),
        F.col("id").cast("string").alias("pk"),
        F.lit("title").alias("after_title"),
        F.lit("content").alias("after_content"),
        F.lit("a").alias("after_author"),
    )
    coll.apply_batch(big)
    before = _bucket_snapshot(path)
    assert len(before) == 16  # 1000 keys cover all 16 buckets

    small = _log(
        spark,
        [
            (5000, "u", "t", "3", "new3", "c", "a"),
            (5001, "d", "t", "7", None, None, None),
        ],
    )
    coll.apply_batch(small)
    after = _bucket_snapshot(path)

    changed = {b for b in before if before[b] != after.get(b)}
    from pyspark.sql import Row

    want = {
        f"bucket={r.b}"
        for r in spark.createDataFrame([Row(tbl="t", pk="3"), Row(tbl="t", pk="7")])
        .select(apply.bucket_expr(("tbl", "pk"), 16).alias("b"))
        .collect()
    }
    assert changed == want and 1 <= len(changed) <= 2

    # and the merge itself is still correct
    got = {r["pk"]: r["after_title"] for r in coll.state().collect()}
    assert got["3"] == "new3" and "7" not in got and len(got) == 999


def test_bucketed_crash_recovery(spark, tmp_path):
    """A crash between the per-bucket renames leaves the bucket only under
    <path>.old/; read_bucketed_state must promote it."""
    import os

    path = str(tmp_path / "state")
    coll = apply.ParquetCollection(spark, path, n_buckets=4)
    coll.apply_batch(
        _log(spark, [(1, "c", "t", "1", "v", "c", "a"), (2, "c", "t", "2", "w", "c", "a")])
    )
    buckets = [n for n in os.listdir(path) if n.startswith("bucket=")]
    victim = buckets[0]
    os.makedirs(path + ".old", exist_ok=True)
    os.rename(os.path.join(path, victim), os.path.join(path + ".old", victim))
    got = {r["pk"] for r in coll.state().collect()}
    assert got == {"1", "2"}
    assert os.path.exists(os.path.join(path, victim))
    assert not os.path.exists(path + ".old")


def test_merge_batch_toast_coalesce(spark):
    """coalesce_unchanged=True backfills a null update column from the
    key's prior state (TOAST 'u' repair) — within one batch, across
    batches, and NEVER across a tombstone."""
    b1 = _log(
        spark,
        [
            (1, "c", "t", "1", "t1", "full", "a"),
            (2, "u", "t", "1", "t2", None, "a"),  # TOASTed content
            (1, "c", "t", "2", "x", "keep", "b"),
            (1, "c", "t", "3", "y", "old", "b"),
            (2, "d", "t", "3", None, None, None),
            (3, "c", "t", "3", "y2", None, "b"),  # reinsert: must NOT see "old"
        ],
    )
    s1 = apply.merge_batch(None, b1, coalesce_unchanged=True)
    got = {r["pk"]: (r["after_title"], r["after_content"]) for r in s1.collect()}
    assert got["1"] == ("t2", "full")      # backfilled within batch
    assert got["2"] == ("x", "keep")
    assert got["3"] == ("y2", None)        # tombstone barrier holds
    # across batches: the carried state row provides the TOASTed value
    # (an update with EVERY text column null is dropped by the F2 guard
    # before it reaches the merge — reference semantics — so the realistic
    # shape is one real column + one TOASTed)
    b2 = _log(spark, [(4, "u", "t", "1", "t4", None, "a2")])
    s2 = apply.merge_batch(s1, b2, coalesce_unchanged=True)
    got2 = {r["pk"]: (r["after_title"], r["after_content"], r["after_author"])
            for r in s2.collect()}
    assert got2["1"] == ("t4", "full", "a2")
    # default (oracle semantics): nulls overwrite
    s_plain = apply.merge_batch(None, b1)
    gotp = {r["pk"]: r["after_content"] for r in s_plain.collect()}
    assert gotp["1"] is None


def test_apply_batch_touched_precompute_equivalent(spark, tmp_path):
    """Round 14 (c6 replay): apply_batch(touched=precomputed) must land
    the same state as the default per-batch distinct+collect path, and
    touched=[] must be a no-op (the replay's empty-batch early return)."""
    base = _log(
        spark,
        [(1, "c", "t", "1", "v1", "c", "a"), (2, "c", "t", "2", "v2", "c", "a")],
    )
    batch = _log(
        spark,
        [
            (3, "u", "t", "1", "v1b", "c", "a"),
            (4, "c", "t", "9", "v9", "c", "a"),
            (5, "d", "t", "2", None, None, None),
        ],
    )
    states = {}
    for mode in ("default", "precomputed"):
        path = str(tmp_path / mode)
        coll = apply.ParquetCollection(spark, path, n_buckets=8)
        coll.apply_batch(base)
        if mode == "precomputed":
            # exactly the caller's one-job derivation (changelog.py c6)
            ev = apply.eligible_events(batch, coll.text_cols)
            touched = [
                r[0]
                for r in ev.select(
                    apply.bucket_expr(coll.key_cols, coll.n_buckets)
                )
                .distinct()
                .collect()
            ]
            coll.apply_batch(batch, touched=touched)
        else:
            coll.apply_batch(batch)
        states[mode] = sorted(
            (r["pk"], r["after_title"], r["after_content"], r["after_author"])
            for r in coll.state().collect()
        )
    assert states["default"] == states["precomputed"]
    assert [pk for pk, *_ in states["default"]] == ["1", "9"]

    # touched=[] is the precomputed form of "no eligible events": no write
    coll = apply.ParquetCollection(spark, str(tmp_path / "noop"), n_buckets=8)
    coll.apply_batch(base)
    before = _bucket_snapshot(str(tmp_path / "noop"))
    coll.apply_batch(batch, touched=[])
    assert _bucket_snapshot(str(tmp_path / "noop")) == before


def test_replay_batched_equals_sequential(spark, tmp_path, sf_dir):
    """Round 15 (VERDICT r14 ask #5, the batched-epoch replay): applying
    a known change log as ONE apply_batch call must land a state
    byte-identical to the old 4-LSN-quartile sequential replay — the
    max-LSN LWW merge (tombstones retained, empty-text guard) makes the
    final state invariant under ANY batch partitioning of the same log.
    This is the invariant c6_cdc_apply's one-call replay rests on."""
    ch = filter_mapped(changes_df(spark, sf_dir), MAPPED).persist()
    try:
        lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
        step = (hi - lo) // 4 + 1
        seq = apply.ParquetCollection(spark, str(tmp_path / "seq"), n_buckets=8)
        for i in range(4):
            seq.apply_batch(
                ch.where(
                    (F.col("lsn") >= lo + i * step)
                    & (F.col("lsn") < lo + (i + 1) * step)
                )
            )
        one = apply.ParquetCollection(spark, str(tmp_path / "one"), n_buckets=8)
        one.apply_batch(ch)
        cols = ["op", "lsn", "pk", "after_title", "after_content", "after_author"]
        a = sorted(map(tuple, seq.read().select(*cols).collect()))
        b = sorted(map(tuple, one.read().select(*cols).collect()))
        assert a == b and len(a) > 0
    finally:
        ch.unpersist()
