"""Sink parity tests: FNV-1a-64 id hash (qdrant.go:174-179), Kafka
message schema (kafka.go:19-26), Milvus payload shape."""

import json

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.sinks import kafka, milvus, qdrant


def test_fnv1a64_known_vectors():
    # published FNV-1a 64 test vectors
    assert qdrant.fnv1a64_py("") == 14695981039346656037
    assert qdrant.fnv1a64_py("a") == 12638187200555641996
    assert qdrant.fnv1a64_py("foobar") == 0x85944171F73967E8


def test_fnv1a64_udf_matches_py(spark):
    ids = ["public.documents:1", "public.documents:42", "x"]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    rows = df.select("id", qdrant.fnv1a64(F.col("id")).alias("h")).collect()
    for r in rows:
        assert int(r["h"]) == qdrant.fnv1a64_py(r["id"])


def _points(spark):
    return spark.createDataFrame(
        [
            ("public.documents:1", [0.6, 0.8], {"table": "public.documents", "pk": "1"},
             "c", "public.documents", "1"),
            ("public.documents:2", None, {"table": "public.documents", "pk": "2"},
             "d", "public.documents", "2"),
        ],
        "id string, vector array<float>, metadata map<string,string>, "
        "op string, tbl string, pk string",
    )


def test_kafka_message_schema(spark):
    rows = kafka.to_kafka_messages(_points(spark)).collect()
    assert [f.name for f in kafka.to_kafka_messages(_points(spark)).schema.fields] == ["key", "value"]
    m1 = json.loads(bytes(rows[0]["value"]))
    # kafka.go:19-26 field set
    assert set(m1) == {"id", "vector", "metadata", "op", "table", "pk"}
    assert m1["op"] == "upsert" and bytes(rows[0]["key"]).decode() == m1["id"]
    m2 = json.loads(bytes(rows[1]["value"]))
    assert m2["op"] == "delete" and "vector" not in m2 or m2.get("vector") is None


def test_qdrant_payloads(spark):
    up = qdrant.upsert_payloads(_points(spark).where(F.col("op") != "d")).collect()
    body = json.loads(up[0]["point_json"])
    assert set(body) == {"id", "vector", "payload"}
    assert body["payload"]["ext_id"] == "public.documents:1"
    assert int(body["id"]) == qdrant.fnv1a64_py("public.documents:1")
    de = qdrant.delete_payloads(_points(spark).where(F.col("op") == "d")).collect()
    dbody = json.loads(de[0]["delete_json"])
    assert int(dbody["points"][0]) == qdrant.fnv1a64_py("public.documents:2")


def test_milvus_payloads(spark):
    out = milvus.insert_payloads(_points(spark).where(F.col("op") != "d")).collect()
    assert json.loads(out[0]["payload_json"])["pk"] == "1"
    assert milvus.delete_expr(["a", 'b"c']) == 'id in ["a","b\\"c"]'


def _mock_milvus():
    """Minimal Milvus REST v2 mock: records every POST, answers /has from
    its own created-collections set."""
    import http.server
    import json as _json
    import threading

    state = {"calls": [], "collections": set()}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            body = _json.loads(self.rfile.read(n))
            state["calls"].append((self.path, body))
            out = {"code": 0, "data": {}}
            if self.path == "/v2/vectordb/collections/has":
                out["data"] = {"has": body["collectionName"] in state["collections"]}
            elif self.path == "/v2/vectordb/collections/create":
                state["collections"].add(body["collectionName"])
            payload = _json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", state


def test_milvus_writer_end_to_end(spark):
    """ensure → insert → delete against a mock Milvus REST v2 server:
    the milvus.go:53-131 ensure flow (has → create varchar(512)-pk/
    vector/json schema → HNSW M=16 ef=200 IP index → load), then batched
    partition inserts (134-158) and a batched delete expr (160-177)."""
    srv, url, state = _mock_milvus()
    try:
        created = milvus.ensure_collection(url, "docs", dim=2)
        assert created
        paths = [p for p, _ in state["calls"]]
        assert paths == [
            "/v2/vectordb/collections/has",
            "/v2/vectordb/collections/create",
            "/v2/vectordb/indexes/create",
            "/v2/vectordb/collections/load",
        ]
        create_body = state["calls"][1][1]
        fields = {f["fieldName"]: f for f in create_body["schema"]["fields"]}
        assert fields["id"]["isPrimary"] and fields["id"]["elementTypeParams"]["max_length"] == 512
        assert fields["vector"]["elementTypeParams"]["dim"] == 2
        assert fields["payload"]["dataType"] == "JSON"
        idx = state["calls"][2][1]["indexParams"][0]
        # indexType must be a SIBLING of metricType (REST v2 contract;
        # nested under params a real server ignores it → AUTOINDEX)
        assert idx["metricType"] == "IP" and idx["indexType"] == "HNSW"
        assert idx["params"] == {"M": 16, "efConstruction": 200}
        # second ensure: has → load only, no re-create
        assert not milvus.ensure_collection(url, "docs", dim=2)
        assert [p for p, _ in state["calls"][4:]] == [
            "/v2/vectordb/collections/has",
            "/v2/vectordb/collections/load",
        ]

        state["calls"].clear()
        pts = _points(spark)
        up = milvus.insert_payloads(pts.where(F.col("op") != "d")).repartition(2)
        up.foreachPartition(lambda rows: milvus.write_partition_http(rows, url, "docs"))
        inserts = [b for p, b in state["calls"] if p == "/v2/vectordb/entities/insert"]
        sent = [d for b in inserts for d in b["data"]]
        assert {d["id"] for d in sent} == {"public.documents:1"}
        assert sent[0]["vector"] == pytest.approx([0.6, 0.8]) and sent[0]["payload"]["pk"] == "1"

        dels = pts.where(F.col("op") == "d").select("id").coalesce(1)
        dels.foreachPartition(lambda rows: milvus.delete_partition_http(rows, url, "docs"))
        del_calls = [b for p, b in state["calls"] if p == "/v2/vectordb/entities/delete"]
        assert del_calls == [
            {"collectionName": "docs", "filter": 'id in ["public.documents:2"]'}
        ]
    finally:
        srv.shutdown()


def test_qdrant_http_writer_end_to_end(spark):
    """foreachPartition → batched PUT /collections/{c}/points?wait=true
    (qdrant.go:196-233 contract; ours batches the partition instead of one
    request per point). The mock runs in the driver; executor workers hit
    it over HTTP like a real Qdrant."""
    import http.server
    import json as _json
    import threading

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_PUT(self):
            assert self.path == "/collections/docs/points?wait=true"
            n = int(self.headers["Content-Length"])
            received.append(_json.loads(self.rfile.read(n)))
            body = b'{"status":"ok"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        pts = spark.createDataFrame(
            [
                ("public.documents:1", [0.6, 0.8], {"table": "documents"}),
                ("public.documents:2", [1.0, 0.0], {"table": "documents"}),
                ("public.documents:3", [0.0, 1.0], {"table": "documents"}),
            ],
            "id string, vector array<float>, metadata map<string,string>",
        ).repartition(2)
        payloads = qdrant.upsert_payloads(pts)
        payloads.foreachPartition(
            lambda rows: qdrant.write_partition_http(rows, url, "docs")
        )
        sent = [p for batch in received for p in batch["points"]]
        assert len(sent) == 3
        assert {p["payload"]["ext_id"] for p in sent} == {
            "public.documents:1", "public.documents:2", "public.documents:3",
        }
        for p in sent:
            assert p["id"] == qdrant.fnv1a64_py(p["payload"]["ext_id"])
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_sink_writers_chunk_oversized_partitions(spark):
    """Round-5 verdict #4: one request per partition has an unbounded
    body (hundreds of MB at dim 768) that real servers reject. A
    partition larger than max_points must be split across >1 request,
    with no row lost or duplicated — for the qdrant upsert/delete AND
    milvus insert/delete writers."""
    import http.server
    import json as _json
    import threading

    calls = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def _reply(self):
            n = int(self.headers["Content-Length"])
            calls.append((self.path, _json.loads(self.rfile.read(n))))
            body = b'{"status":"ok","data":{}}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        do_PUT = _reply
        do_POST = _reply

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        n = 10
        pts = spark.createDataFrame(
            [(f"doc:{i}", [float(i), 1.0], {"pk": str(i)}) for i in range(n)],
            "id string, vector array<float>, metadata map<string,string>",
        ).coalesce(1)  # ONE partition of 10 rows, cap 4 → 3 requests

        qdrant.upsert_payloads(pts).foreachPartition(
            lambda rows: qdrant.write_partition_http(rows, url, "docs", max_points=4)
        )
        bodies = [b["points"] for p, b in calls if p.endswith("/points?wait=true")]
        assert [len(b) for b in bodies] == [4, 4, 2]
        assert {pt["payload"]["ext_id"] for b in bodies for pt in b} == {
            f"doc:{i}" for i in range(n)
        }

        calls.clear()
        pts.select("id").foreachPartition(
            lambda rows: qdrant.delete_partition_http(rows, url, "docs", max_points=4)
        )
        del_bodies = [b["points"] for p, b in calls if p.endswith("/points/delete?wait=true")]
        assert [len(b) for b in del_bodies] == [4, 4, 2]
        assert {i for b in del_bodies for i in b} == {
            qdrant.fnv1a64_py(f"doc:{i}") for i in range(n)
        }

        calls.clear()
        milvus.insert_payloads(pts).foreachPartition(
            lambda rows: milvus.write_partition_http(rows, url, "docs", max_points=4)
        )
        ins = [b["data"] for p, b in calls if p.endswith("/entities/insert")]
        assert [len(b) for b in ins] == [4, 4, 2]
        assert {d["id"] for b in ins for d in b} == {f"doc:{i}" for i in range(n)}

        calls.clear()
        pts.select("id").foreachPartition(
            lambda rows: milvus.delete_partition_http(rows, url, "docs", max_points=4)
        )
        dels = [b["filter"] for p, b in calls if p.endswith("/entities/delete")]
        assert len(dels) == 3
        got = {i for f in dels for i in _json.loads(f[len("id in "):])}
        assert got == {f"doc:{i}" for i in range(n)}
    finally:
        srv.shutdown()


def test_retry_absorbs_transient_errors_and_fails_fast_on_4xx():
    """sinks/http.py: 5xx/429/network errors retry with backoff; other
    4xx fail immediately (resending a malformed body never heals)."""
    import http.server
    import threading
    import urllib.error
    import urllib.request

    import pytest as _pytest

    from cdc2vec_spark.sinks.http import send_with_retry

    calls = {"n": 0, "codes": []}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            calls["n"] += 1
            code = calls["codes"].pop(0) if calls["codes"] else 200
            self.send_response(code)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/x"
    try:
        # two transient failures, then success — absorbed by retries
        calls["codes"] = [503, 429]
        req = urllib.request.Request(url, data=b"{}", method="POST")
        assert send_with_retry(req, timeout_s=5, backoff_s=0.01) == b"ok"
        assert calls["n"] == 3

        # a 400 fails fast: exactly ONE request
        calls["n"], calls["codes"] = 0, [400]
        with _pytest.raises(urllib.error.HTTPError):
            send_with_retry(
                urllib.request.Request(url, data=b"{}", method="POST"),
                timeout_s=5, backoff_s=0.01,
            )
        assert calls["n"] == 1

        # retries exhausted: the final 503 propagates after 1+3 attempts
        calls["n"], calls["codes"] = 0, [503, 503, 503, 503]
        with _pytest.raises(urllib.error.HTTPError):
            send_with_retry(
                urllib.request.Request(url, data=b"{}", method="POST"),
                timeout_s=5, retries=3, backoff_s=0.01,
            )
        assert calls["n"] == 4
    finally:
        srv.shutdown()


def test_qdrant_writer_survives_transient_503(spark):
    """End-to-end: the partition writer lands its points even when the
    server 503s the first attempt of each request."""
    import http.server
    import json
    import threading

    from cdc2vec_spark.sinks import qdrant as q

    seen = {"points": [], "fail_next": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_PUT(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if seen["fail_next"] > 0:
                seen["fail_next"] -= 1
                self.send_response(503)
                self.end_headers()
                return
            seen["points"].extend(json.loads(body)["points"])
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        pts = _points(spark)
        payloads = q.upsert_payloads(pts).collect()
        seen["fail_next"] = 1
        q.write_partition_http(payloads, url, "c")
        assert len(seen["points"]) == len(payloads)
    finally:
        srv.shutdown()


def test_qdrant_ensure_collection_create_verify_and_mismatch():
    """qdrant.go:70-145 parity: absent collection → PUT create with the
    vectors config; present with matching dim → no create; present with a
    DIFFERENT dim → hard error (silent wrong-dim writes 400 every
    upsert). Only a 200 info response skips creation."""
    import http.server
    import json as _json
    import threading

    import pytest as _pytest

    from cdc2vec_spark.sinks.qdrant import ensure_collection

    state = {"exists_dim": None}
    created = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if state["exists_dim"] is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = _json.dumps({
                "result": {"config": {"params": {"vectors": {
                    "size": state["exists_dim"], "distance": "Cosine"}}}}
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_PUT(self):
            n = int(self.headers["Content-Length"])
            created.append((self.path, _json.loads(self.rfile.read(n))))
            body = b'{"result":true,"status":"ok"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # absent → create with the right body
        assert ensure_collection(url, "docs", dim=4) == 4
        assert created == [(
            "/collections/docs",
            {"vectors": {"size": 4, "distance": "Cosine"}},
        )]
        # present, matching → verified, no second create
        state["exists_dim"] = 4
        assert ensure_collection(url, "docs", dim=4) == 4
        assert len(created) == 1
        # present, mismatched → refuse
        with _pytest.raises(ValueError, match="size=4.*dim=8"):
            ensure_collection(url, "docs", dim=8)
    finally:
        srv.shutdown()


def test_qdrant_ensure_collection_409_rechecks_dim():
    """A transiently failing info GET followed by a 409 on create must
    NOT skip the dim check: ensure_collection re-fetches the collection
    info and verifies the size (treating 409 as unconditional success
    would let a mismatched collection pass as verified, and every
    subsequent upsert would 400 opaquely)."""
    import http.server
    import json as _json
    import threading

    import pytest as _pytest

    from cdc2vec_spark.sinks.qdrant import ensure_collection

    state = {"get_codes": [], "exists_dim": 4}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            code = state["get_codes"].pop(0) if state["get_codes"] else 200
            if code != 200:
                self.send_response(code)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = _json.dumps({
                "result": {"config": {"params": {"vectors": {
                    "size": state["exists_dim"], "distance": "Cosine"}}}}
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_PUT(self):
            n = int(self.headers["Content-Length"])
            self.rfile.read(n)
            self.send_response(409)  # concurrent creator / already exists
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # transient 404 on info → create 409s → re-fetch sees size=4 but
        # the pipeline embeds dim=8 → refuse, do not report verified
        state["get_codes"] = [404]
        with _pytest.raises(ValueError, match="size=4.*dim=8"):
            ensure_collection(url, "docs", dim=8)
        # same dance with a MATCHING size → verified via the re-fetch
        state["get_codes"] = [404]
        assert ensure_collection(url, "docs", dim=4) == 4
    finally:
        srv.shutdown()
