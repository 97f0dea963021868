"""Deployment-packaging guards (VERDICT r07 ask #5): the compose/demo
story must stay internally consistent — every file the compose mounts
exists, every CONFIG_PATH it sets parses through the engine's own
loader, and the demo SQL actually feeds the table the mapping watches.
(The reference's compose mounts scripts/init-postgres.sql and its demo
script copies a test.sql — neither ever committed; these tests are what
would have caught that.)

A live `docker compose up` smoke is env-gated behind
CDC2VEC_COMPOSE_TEST=1 (docker + network are absent in CI sandboxes).
"""

import os
import re
import subprocess

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _compose():
    with open(os.path.join(REPO, "docker-compose.yaml")) as f:
        return yaml.safe_load(f)


def test_compose_parses_and_has_core_services():
    c = _compose()
    assert {"postgres", "qdrant", "engine"} <= set(c["services"])
    # every service with a profile is optional; core services have none
    for name in ("postgres", "qdrant", "engine"):
        assert "profiles" not in c["services"][name]


def test_compose_mounted_files_exist():
    c = _compose()
    for svc in c["services"].values():
        for vol in svc.get("volumes", ()):
            src = str(vol).split(":", 1)[0]
            if src.startswith("./"):
                assert os.path.exists(os.path.join(REPO, src)), src


def test_every_compose_config_path_loads_through_engine_loader():
    from cdc2vec_spark.config import load_yaml

    c = _compose()
    seen = 0
    for svc in c["services"].values():
        env = svc.get("environment") or {}
        if isinstance(env, list):
            env = dict(e.split("=", 1) for e in env)
        path = env.get("CONFIG_PATH", "")
        if not path:
            continue
        seen += 1
        local = os.path.join(REPO, path.replace("/app/", ""))
        assert os.path.exists(local), local
        cfg = load_yaml(local)
        assert cfg.engine.mappings, local
        assert cfg.all_sinks, local
    assert seen >= 2  # engine + engine-fanout


def test_fanout_config_declares_the_fanout_sinks():
    from cdc2vec_spark.config import load_yaml

    cfg = load_yaml(os.path.join(REPO, "configs", "fanout-three-sinks.yaml"))
    assert [s.type for s in cfg.all_sinks] == [
        "qdrant", "ivf_index", "lex_index", "group_agg"
    ]
    # the in-engine sinks need a path — the runner raises without it
    for s in cfg.all_sinks[1:]:
        assert s.options.get("path"), s.type


def test_demo_sql_feeds_the_mapped_table():
    from cdc2vec_spark.config import load_yaml

    cfg = load_yaml(os.path.join(REPO, "configs", "postgres-qdrant.yaml"))
    table = cfg.engine.mappings[0].table  # "public.documents"
    init = open(os.path.join(REPO, "scripts", "init-postgres.sql")).read()
    demo = open(os.path.join(REPO, "scripts", "demo.sql")).read()
    assert re.search(rf"CREATE TABLE IF NOT EXISTS {re.escape(table)}", init)
    assert f"CREATE PUBLICATION cdc2vec FOR TABLE {table}" in init
    for stmt in ("INSERT INTO", "UPDATE", "DELETE FROM"):
        assert stmt in demo, stmt  # demo exercises all three ops
    assert table in demo
    # the mapping's columns are real columns of the demo table
    m = cfg.engine.mappings[0]
    for col in (m.id_column, *m.text_columns, *m.metadata_columns):
        assert re.search(rf"^\s+{col}\s", init, re.M), col


def test_entrypoint_wiring():
    ep = open(os.path.join(REPO, "scripts", "docker-entrypoint.sh")).read()
    assert "python -m cdc2vec_spark" in ep
    assert "ReplicationTailer" in ep and 'plugin="pgoutput"' in ep
    assert os.access(os.path.join(REPO, "scripts", "docker-entrypoint.sh"), os.X_OK)
    df = open(os.path.join(REPO, "Dockerfile")).read()
    assert "EXPOSE 8080" in df and "docker-entrypoint.sh" in df
    # every COPY source in the Dockerfile exists
    for m in re.finditer(r"^COPY\s+(\S+)\s", df, re.M):
        if not m.group(1).startswith("--"):
            assert os.path.exists(os.path.join(REPO, m.group(1))), m.group(1)


def test_makefile_targets():
    mk = open(os.path.join(REPO, "Makefile")).read()
    for target in ("test:", "oracle:", "bench:", "run-pg:", "demo:", "up:"):
        assert f"\n{target}" in mk, target


@pytest.mark.skipif(
    os.environ.get("CDC2VEC_COMPOSE_TEST") != "1",
    reason="live compose smoke is env-gated (needs docker + network)",
)
def test_compose_config_validates_live():
    out = subprocess.run(
        ["docker", "compose", "config", "--quiet"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
