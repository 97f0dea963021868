"""c12 — incrementally-maintained GROUP BY materialization (IVM).

Exact DuckDB oracle (LWW winners → group agg) at two SFs via the
driver's comparator; incremental ≡ batch recompute after every single
micro-batch (not just the last); delta accounting drains groups to
exactly zero on full delete.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.cdc import transform
from cdc2vec_spark.cdc.changelog import CHANGES_CTE, MAPPED, changes_df
from cdc2vec_spark.cdc.ivm import (
    C12_ORACLE_BODY,
    IncrementalGroupAgg,
    c12_incremental_agg,
)
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c12_incremental_agg", c12_incremental_agg,
        CHANGES_CTE + C12_ORACLE_BODY, sf,
    )
    assert not problems, (sf, problems)


def _agg_of(df, group="after_author"):
    from cdc2vec_spark.cdc.envelope import OP_DELETE

    txt = F.concat_ws(
        " ",
        F.nullif(F.col("after_title"), F.lit("")),
        F.nullif(F.col("after_content"), F.lit("")),
    )
    return {
        r["grp"]: (r["n"], r["chars"])
        for r in df.where(F.col("op") != OP_DELETE)
        .groupBy(F.col(group).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length(txt)).alias("chars"))
        .collect()
    }


def test_incremental_equals_recompute_after_every_batch(spark, sf_dir, tmp_path):
    """After EACH micro-batch (not just the final one) the maintained agg
    equals a from-scratch GROUP BY over the collection's live state."""
    from cdc2vec_spark.cdc.apply import ParquetCollection

    ch = transform.filter_mapped(changes_df(spark, sf_dir), MAPPED).persist()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // 3 + 1
    ivm = IncrementalGroupAgg(spark, str(tmp_path / "ivm"), n_buckets=8)
    ref = ParquetCollection(spark, str(tmp_path / "ref"), n_buckets=8)
    for i in range(3):
        b = ch.where(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        ivm.apply_batch(b)
        ref.apply_batch(b)
        got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
        want = _agg_of(ref.read())
        assert got == want != {}, (i, got, want)
    ch.unpersist()


def test_groups_drain_to_zero_on_delete(spark, tmp_path):
    """Deleting a group's every key removes its agg row entirely."""
    ivm = IncrementalGroupAgg(spark, str(tmp_path / "z"), n_buckets=4)
    rows = [
        (1, "c", "public.documents", "k1", "aaa", "bbb", "g1"),
        (2, "c", "public.documents", "k2", "ccc", "", "g1"),
        (3, "c", "public.documents", "k3", "ddd", "eee", "g2"),
    ]
    schema = ("lsn long, op string, tbl string, pk string, "
              "after_title string, after_content string, after_author string")
    ivm.apply_batch(spark.createDataFrame(rows, schema))
    got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
    assert got == {"g1": (2, 10), "g2": (1, 7)}, got

    dels = [
        (4, "d", "public.documents", "k1", None, None, None),
        (5, "d", "public.documents", "k2", None, None, None),
    ]
    ivm.apply_batch(spark.createDataFrame(dels, schema))
    got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
    assert got == {"g2": (1, 7)}, got


def test_streaming_foreachbatch_maintains_the_aggregate(spark, sf_dir, tmp_path):
    """The apply_batch signature IS a foreachBatch hook: a real file
    stream driving IncrementalGroupAgg converges to the same agg table
    as the batch replay."""
    from cdc2vec_spark.streaming import source

    ch = transform.filter_mapped(changes_df(spark, sf_dir), MAPPED)
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ch, chunks, n_chunks=3, order_col="lsn")
    ivm = IncrementalGroupAgg(spark, str(tmp_path / "sivm"), n_buckets=8)
    stream = source.read_file_stream(spark, chunks, ch.schema)
    q = (
        stream.writeStream.foreachBatch(ivm.apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
    want = _agg_of(
        __import__("cdc2vec_spark.cdc.apply", fromlist=["latest_state"])
        .latest_state(ch, text_cols=("after_title", "after_content"))
    )
    assert got == want != {}


def test_randomized_cdc_sequences_match_python_reference(spark, tmp_path):
    """Fixed-seed fuzz: random op sequences (insert/update/delete/guard-
    fail/ignored-table/out-of-order lsn) through the IVM in 3 batches
    must equal a pure-Python LWW + aggregate reference."""
    import random

    schema = ("lsn long, op string, tbl string, pk string, "
              "after_title string, after_content string, after_author string")
    for seed in (7, 23):
        rng = random.Random(seed)
        rows = []
        for lsn in range(1, 121):
            pk = f"k{rng.randrange(12)}"
            op = rng.choice(["c", "u", "u", "d"])
            tbl = "public.documents" if rng.random() > 0.1 else "public.other"
            if op == "d":
                rows.append((lsn, op, tbl, pk, None, None, None))
            else:
                title = rng.choice(["", "alpha", "beta gamma", "x" * rng.randrange(1, 9)])
                content = rng.choice(["", "delta", None, "y" * rng.randrange(1, 6)])
                grp = rng.choice(["g1", "g2", "g3"])
                rows.append((lsn, op, tbl, pk, title, content, grp))
        rng.shuffle(rows)  # arrival order != lsn order within a batch

        # python reference: LWW by lsn with A6 semantics (guard-fail
        # upserts are SKIPPED: earlier state survives)
        state = {}

        def text_of(t, c):
            return " ".join(x for x in (t, c) if x)

        for lsn, op, tbl, pk, t, c, g in sorted(rows):
            if tbl != "public.documents":
                continue
            if op == "d":
                state[pk] = None
            elif len(text_of(t, c)) > 0:
                state[pk] = (g, len(text_of(t, c)))
        want = {}
        for v in state.values():
            if v is not None:
                g, n = v
                cnt, ch_ = want.get(g, (0, 0))
                want[g] = (cnt + 1, ch_ + n)

        ivm = IncrementalGroupAgg(
            spark, str(tmp_path / f"fz{seed}"), n_buckets=4
        )
        third = len(rows) // 3 + 1
        for i in range(3):
            b = rows[i * third:(i + 1) * third]
            if b:
                # production order: the mapping filter runs BEFORE apply
                # (runner pipeline); state keys on (tbl, pk), so unmapped
                # tables must not reach the collection
                ivm.apply_batch(
                    transform.filter_mapped(
                        spark.createDataFrame(b, schema), MAPPED
                    )
                )
        got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
        assert got == want, (seed, got, want)


def test_boot_group_agg_sink_end_to_end(spark, sf_dir, tmp_path):
    """sink.type=group_agg in the config: boot() maintains the IVM agg
    table from the live stream; after the replay it equals the GROUP BY
    over the collection's live points (count per author + chars of the
    extracted text)."""
    from cdc2vec_spark import runner
    from cdc2vec_spark.config import (
        DEFAULT_CONFIG, PipelineConfig, SinkConfig, SourceConfig,
    )
    from cdc2vec_spark.streaming import source

    gpath = str(tmp_path / "gagg")
    cfg = PipelineConfig(
        engine=DEFAULT_CONFIG, source=SourceConfig(),
        sink=SinkConfig(
            type="group_agg",
            # the fixture mapping's metadata key is the raw change column
            options={"path": gpath, "group_key": "after_author"},
        ),
    )
    ch = transform.filter_mapped(changes_df(spark, sf_dir), MAPPED)
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ch, chunks, n_chunks=3, order_col="lsn")
    query, coll, _ = runner.boot(
        spark, config=cfg, changes_dir=chunks, changes_schema=ch.schema,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    from cdc2vec_spark.cdc.ivm import IncrementalGroupAgg

    agg = IncrementalGroupAgg(spark, gpath, group_col="after_grp",
                              text_cols=("after_text",))
    got = {r["grp"]: (r["n"], r["chars"]) for r in agg.read().collect()}
    # reference: LWW over the change log (the collection stores vectors,
    # not text; the agg's chars come from the same extracted text the
    # pipeline embeds, whose length equals the changes' concat form)
    from cdc2vec_spark.cdc.apply import latest_state

    want = _agg_of(latest_state(ch, text_cols=("after_title", "after_content")))
    assert got == want != {}
    # and the agg's live keys agree with the collection's live count
    assert sum(n for n, _ in got.values()) == coll.live().count()
