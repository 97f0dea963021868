"""Process entry point — the reference's cmd/cdc2vec/main.go lifecycle
(main.go:33-157) as ``python -m cdc2vec_spark``:

1. load config ($CONFIG_PATH or --config YAML)
2. build the embeddings provider + keyed point collection (+ optional
   external sink hook from sink.type)
3. start the source (wal2json bridge for source.type=postgres dev mode,
   or a pre-chunked/Kafka-fed directory), the streaming pipeline, and
   the /healthz endpoint
4. wait for SIGINT/SIGTERM, then stop source → pipeline → http, the
   reference's shutdown order (main.go:155-174)

``build_app`` does everything except the signal wait, so tests drive the
full lifecycle in-process without a subprocess.
"""

from __future__ import annotations

import argparse
import os
import signal

from .config import Mapping, PipelineConfig, load_from_env, load_yaml


def flat_schema_for(mapping: Mapping):
    """The flattened change schema (lsn, op, tbl, pk, after_*) implied by
    a table mapping — what the chunk files / Kafka decode emit."""
    from pyspark.sql import types as T

    fields = [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tbl", T.StringType()),
        T.StructField("pk", T.StringType()),
    ]
    for c in (*mapping.text_columns, *mapping.metadata_columns):
        name = c if c.startswith("after_") else f"after_{c}"
        fields.append(T.StructField(name, T.StringType()))
    return T.StructType(fields)


def _after_keys(mapping: Mapping) -> list[str]:
    return [
        c.removeprefix("after_")
        for c in (*mapping.text_columns, *mapping.metadata_columns)
    ]


def build_app(cfg: PipelineConfig, work_dir: str, wal_path: str | None = None,
              health_port: int | None = None):
    """Assemble the running engine. Returns (spark, query, coll, server,
    stop). ``wal_path`` selects the bare-Postgres dev bridge
    (source.type=postgres); otherwise ``work_dir``/chunks is consumed
    directly (pre-chunked replay or an external feeder)."""
    from . import runner
    from .session import get_spark

    if not cfg.engine.mappings:
        raise ValueError("config has no table mappings")
    mapping = cfg.engine.mappings[0]
    spark = get_spark("cdc2vec")

    if wal_path is not None:
        query, coll, server, stop = runner.boot_from_postgres(
            spark,
            cfg,
            wal_path=wal_path,
            work_dir=work_dir,
            id_column=mapping.id_column,
            after_keys=_after_keys(mapping),
            health_port=health_port,
        )
        return spark, query, coll, server, stop

    chunks = os.path.join(work_dir, "chunks")
    os.makedirs(chunks, exist_ok=True)
    query, coll, server = runner.boot(
        spark,
        cfg,
        changes_dir=chunks,
        changes_schema=flat_schema_for(mapping),
        state_dir=os.path.join(work_dir, "state"),
        checkpoint_dir=os.path.join(work_dir, "ckpt"),
        health_port=health_port,
    )

    def stop():
        query.stop()
        if server is not None:
            server.shutdown()

    return spark, query, coll, server, stop


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cdc2vec_spark")
    ap.add_argument("--config", help="YAML config path (default: $CONFIG_PATH)")
    ap.add_argument("--work-dir", required=True,
                    help="engine working directory (chunks/state/checkpoint)")
    ap.add_argument("--wal", help="wal2json NDJSON file to tail (postgres dev mode)")
    ap.add_argument("--health-port", type=int, default=8080)
    args = ap.parse_args(argv)

    cfg = load_yaml(args.config) if args.config else load_from_env()
    _, query, _, _, stop = build_app(
        cfg, args.work_dir, wal_path=args.wal, health_port=args.health_port
    )

    for sig in (signal.SIGINT, signal.SIGTERM):  # main.go:154-157
        signal.signal(sig, lambda *_: stop())
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
