#!/bin/sh
# Container entrypoint: optionally start the live Postgres
# logical-replication tailer (pgoutput — built into core Postgres, no
# contrib plugin needed), then run the engine against the tailed WAL
# file. Without SOURCE_DSN the engine consumes pre-chunked changes from
# /data/work/chunks (Kafka feeder / replay topologies).
#
# Env:
#   CONFIG_PATH   engine YAML (default baked into the image)
#   SOURCE_DSN    when set, tail this Postgres via START_REPLICATION
#   SOURCE_SLOT   replication slot name       (default cdc2vec)
#   SOURCE_PUB    publication name            (default cdc2vec)
set -e

WORK_DIR=${WORK_DIR:-/data/work}
mkdir -p "$WORK_DIR"

if [ -n "$SOURCE_DSN" ]; then
    WAL_FILE=${WAL_FILE:-/data/work/wal.ndjson}
    python - <<'PY' &
import os
from cdc2vec_spark.cdc.postgres import ReplicationTailer

ReplicationTailer(
    os.environ["SOURCE_DSN"],
    os.environ.get("SOURCE_SLOT", "cdc2vec"),
    os.environ.get("WAL_FILE", "/data/work/wal.ndjson"),
    create_slot=True,
    plugin="pgoutput",
    publication=os.environ.get("SOURCE_PUB", "cdc2vec"),
).run()
PY
    exec python -m cdc2vec_spark --work-dir "$WORK_DIR" --wal "$WAL_FILE" "$@"
fi

exec python -m cdc2vec_spark --work-dir "$WORK_DIR" "$@"
