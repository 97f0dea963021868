"""Reference-parity unit tests for the CDC transforms (SURVEY §5:
TestConcatenateColumns ported verbatim, plus the edge rules cited from
util/text.go and pipeline.go)."""

from pyspark.sql import functions as F

from cdc2vec_spark.cdc import transform
from cdc2vec_spark.config import Mapping


def _one(spark, **cols):
    return spark.createDataFrame([cols])


def test_concat_reference_case(spark):
    # internal/util/text_test.go:5-11 — {a:"hello", b:"world", c:nil},
    # cols [a, c, b] → "hello world" (nil skipped, config order kept)
    df = spark.createDataFrame([("hello", "world", None)], "a string, b string, c string")
    out = df.select(transform.concat_text(["a", "c", "b"]).alias("t")).first()
    assert out["t"] == "hello world"


def test_concat_skips_empty_string(spark):
    # util/text.go:16-19 — "" skipped like nil
    df = spark.createDataFrame([("x", "", "y")], "a string, b string, c string")
    out = df.select(transform.concat_text(["a", "b", "c"]).alias("t")).first()
    assert out["t"] == "x y"


def test_concat_all_empty(spark):
    df = spark.createDataFrame([(None, "")], "a string, b string")
    out = df.select(transform.concat_text(["a", "b"]).alias("t")).first()
    assert out["t"] == ""


def test_derive_key(spark):
    # pipeline.go:189 — id = "<schema>.<table>:<pk>"
    df = _one(spark, tbl="public.documents", pk="42")
    out = df.select(transform.derive_key().alias("id")).first()
    assert out["id"] == "public.documents:42"


def test_metadata_presence_filter(spark):
    # pipeline.go:234-241 — missing metadata columns skipped, table+pk kept
    m = Mapping(table="public.documents", id_column="pk",
                metadata_columns=("author", "created"))
    df = spark.createDataFrame(
        [("public.documents", "7", "alice", None)],
        "tbl string, pk string, author string, created string",
    )
    out = df.select(transform.metadata_map(m).alias("meta")).first()["meta"]
    assert out == {"table": "public.documents", "pk": "7", "author": "alice"}


def test_filter_mapped(spark):
    df = spark.createDataFrame(
        [("public.documents", 1), ("public.ignored", 2)], "tbl string, x int"
    )
    out = transform.filter_mapped(df, ["public.documents"]).collect()
    assert [r["x"] for r in out] == [1]


def test_guard_nonempty_deletes_pass(spark):
    # pipeline.go:191-208 — deletes bypass the empty-text guard
    df = spark.createDataFrame(
        [("d", ""), ("c", ""), ("u", "hi")], "op string, txt string"
    )
    out = transform.guard_nonempty(df, "txt").select("op").collect()
    assert sorted(r["op"] for r in out) == ["d", "u"]


def test_concat_text_numeric_columns_ansi_safe(spark):
    """Numeric text_columns must stringify (Go %v analogue) — the ''
    comparison must happen AFTER the cast or ANSI mode throws."""
    df = spark.createDataFrame([(5, 3.5, "x"), (None, None, "")], "a int, b double, c string")
    out = [
        r["txt"]
        for r in df.select(transform.concat_text(["a", "b", "c"]).alias("txt")).collect()
    ]
    assert out[0] == "5 3.5 x"
    assert out[1] == ""  # all null/empty skipped
