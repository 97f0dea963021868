"""Embedding provider tests — mirrors the reference's test strategy
(embeddings_test.go: provider against an in-process HTTP mock) plus
determinism guarantees for the hash provider (SURVEY §2.2 A8)."""

import http.server
import json
import threading

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.cdc.pipeline import build_points
from cdc2vec_spark.config import DOCUMENTS_MAPPING
from cdc2vec_spark.embed.provider import (
    DeterministicHashProvider,
    OllamaHTTPProvider,
    get_provider,
)


def test_hash_provider_deterministic():
    p = DeterministicHashProvider(dim=32)
    a, b = p.embed_one("hello world"), p.embed_one("hello world")
    assert np.array_equal(a, b)
    assert len(a) == 32
    assert not np.array_equal(a, p.embed_one("hello worlds"))
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_hash_provider_udf_matches_local(spark):
    p = DeterministicHashProvider(dim=16)
    df = spark.createDataFrame([("abc",), ("def",)], "text string")
    rows = df.select("text", p.udf()(F.col("text")).alias("v")).collect()
    for r in rows:
        assert np.allclose(r["v"], p.embed_one(r["text"]), atol=1e-7)


def test_udf_runs_twice_identical(spark):
    p = DeterministicHashProvider(dim=32)
    df = spark.createDataFrame([(f"t{i}",) for i in range(50)], "text string")
    a = df.select(p.udf()(F.col("text")).alias("v")).collect()
    b = df.select(p.udf()(F.col("text")).alias("v")).collect()
    assert [r["v"] for r in a] == [r["v"] for r in b]


class _MockOllama(http.server.BaseHTTPRequestHandler):
    # ≅ embeddings_test.go:12-44 httptest mock: checks path, returns vector
    def do_POST(self):
        assert self.path == "/api/embeddings"
        n = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(n))
        dim = min(8, max(4, len(body["prompt"]) // 4))
        resp = json.dumps({"embedding": [0.1] * dim}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def mock_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _MockOllama)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_ollama_http_provider(mock_server):
    p = OllamaHTTPProvider(mock_server, "test-model")
    vec = p.embed_one("hello world, a prompt of decent length")
    assert len(vec) == 8 and vec[0] == pytest.approx(0.1)


def test_provider_factory():
    assert isinstance(get_provider("deterministic", dim=8), DeterministicHashProvider)
    assert isinstance(
        get_provider("ollama_http", url="http://x", model="m"), OllamaHTTPProvider
    )
    with pytest.raises(ValueError):
        get_provider("nope")


def test_ollama_udf_concurrent_preserves_order(spark, mock_server):
    """The thread-pooled UDF must return row-aligned vectors: the mock's
    dim depends on prompt length, so any reordering is visible."""
    prompts = [("x" * n,) for n in (4, 16, 20, 24, 28, 32, 8, 12)]
    df = spark.createDataFrame(prompts, "text string").coalesce(2)
    p = OllamaHTTPProvider(mock_server, "test-model", concurrency=4)
    rows = df.select("text", p.udf()(F.col("text")).alias("v")).collect()
    for r in rows:
        assert len(r["v"]) == min(8, max(4, len(r["text"]) // 4))


def test_delete_rows_never_hit_the_embedder(spark):
    """build_points must not call the provider for deletes: with an
    unreachable embedding server, a delete-only batch still succeeds
    (a UDF under F.when would be executed unconditionally — the pipeline
    nulls the INPUT instead)."""
    from cdc2vec_spark.cdc.pipeline import build_points
    from cdc2vec_spark.config import DOCUMENTS_MAPPING

    changes = spark.createDataFrame(
        [(1, "d", "public.documents", "1", None, None, None)],
        "lsn long, op string, tbl string, pk string, after_title string, "
        "after_content string, after_author string",
    )
    dead = OllamaHTTPProvider("http://127.0.0.1:9", "m", timeout_s=1.0)
    pts = build_points(changes, DOCUMENTS_MAPPING, dead).collect()
    assert len(pts) == 1
    assert pts[0]["op"] == "d" and pts[0]["vector"] is None


def test_dedupe_embed_output_equals_default(spark):
    """dedupe_embed=True is a pure optimization: bit-identical points
    (vectors included) on a batch full of duplicate texts and deletes."""
    rows = [
        (1, "c", "public.documents", "k1", "same text", "body", "au"),
        (2, "c", "public.documents", "k2", "same text", "body", "au"),
        (3, "u", "public.documents", "k3", "same text", "body", "au"),
        (4, "c", "public.documents", "k4", "other", "body2", "au"),
        (5, "d", "public.documents", "k5", None, None, None),
    ]
    schema = ("lsn long, op string, tbl string, pk string, "
              "after_title string, after_content string, after_author string")
    ch = spark.createDataFrame(rows, schema)
    prov = DeterministicHashProvider(dim=8)
    base = {r["id"]: r for r in build_points(ch, DOCUMENTS_MAPPING, prov).collect()}
    dd = {
        r["id"]: r
        for r in build_points(
            ch, DOCUMENTS_MAPPING, prov, dedupe_embed=True
        ).collect()
    }
    assert set(base) == set(dd)
    for k in base:
        assert dd[k]["vector"] == base[k]["vector"], k
        assert dd[k]["metadata"] == base[k]["metadata"], k
        assert dd[k]["op"] == base[k]["op"], k
    # the delete kept its NULL vector through the left join
    dels = [r for r in dd.values() if r["op"] == "d"]
    assert dels and all(r["vector"] is None for r in dels)


def test_dedupe_embed_calls_provider_once_per_distinct_text(spark):
    """Behavioral proof the provider sees each distinct text once: a
    provider that salts every response with randomness yields IDENTICAL
    vectors for same-text rows only when the embed was shared."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    class RandomSaltProvider:
        supports_fused_normalize = False

        def udf(self, normalize: bool = False):
            @F.pandas_udf(T.ArrayType(T.DoubleType()))
            def _emb(texts: pd.Series) -> pd.Series:
                def one(t):
                    if t is None:
                        return None
                    rng = np.random.default_rng()
                    return [float(len(t)), float(rng.random())]

                return texts.map(one)

            return _emb

    rows = [
        (i, "c", "public.documents", f"k{i}", "dup text", "b", "au")
        for i in range(6)
    ] + [(9, "c", "public.documents", "k9", "unique", "b", "au")]
    schema = ("lsn long, op string, tbl string, pk string, "
              "after_title string, after_content string, after_author string")
    ch = spark.createDataFrame(rows, schema)
    pts = build_points(
        ch, DOCUMENTS_MAPPING, RandomSaltProvider(),
        normalize=False, dedupe_embed=True,
    ).collect()
    by_text_salt = {}
    for r in pts:
        by_text_salt.setdefault(r["vector"][0], set()).add(r["vector"][1])
    # all 6 "dup text b" rows share ONE salted vector -> one provider call
    assert all(len(salts) == 1 for salts in by_text_salt.values()), by_text_salt
    assert len(by_text_salt) == 2  # two distinct texts
