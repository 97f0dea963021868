#!/bin/sh
# Feed the demo change set through the running compose stack — the
# working version of the reference's scripts/setup-demo.sh (which copies
# a test.sql that was never committed; ours ships as scripts/demo.sql).
#
# Usage: ./scripts/setup-demo.sh        (after `docker compose up -d`)
set -e

cd "$(dirname "$0")/.."

PG=$(docker compose ps -q postgres)
if [ -z "$PG" ]; then
    echo "postgres service is not running — start with: docker compose up -d" >&2
    exit 1
fi

echo "waiting for postgres to accept connections..."
docker exec "$PG" sh -c 'until pg_isready -U postgres -d testdb >/dev/null 2>&1; do sleep 1; done'

echo "feeding scripts/demo.sql..."
docker exec -i "$PG" psql -U postgres -d testdb < scripts/demo.sql

echo "demo feed complete — watch the engine:"
echo "  curl localhost:8080/healthz"
echo "  curl 'localhost:6333/collections/documents/points/count' -X POST -H 'Content-Type: application/json' -d '{\"exact\": true}'"
