-- Postgres init for the compose demo (the file the reference's compose
-- mounts at /docker-entrypoint-initdb.d but never committed —
-- /root/reference/docker-compose.yaml:12 references
-- scripts/init-postgres.sql, which does not exist there).
--
-- Creates the demo table the default mapping watches
-- (configs/postgres-qdrant.yaml: public.documents, id/title/content/
-- author/created_at) plus the publication the pgoutput tailer attaches
-- to. REPLICA IDENTITY FULL so UPDATE/DELETE messages carry the old
-- row — the engine's delete path needs the pk from the 'before' image.

CREATE TABLE IF NOT EXISTS public.documents (
    id          BIGINT PRIMARY KEY,
    title       TEXT NOT NULL DEFAULT '',
    content     TEXT NOT NULL DEFAULT '',
    author      TEXT NOT NULL DEFAULT '',
    created_at  TIMESTAMPTZ NOT NULL DEFAULT now()
);

ALTER TABLE public.documents REPLICA IDENTITY FULL;

-- the publication the engine's tailer subscribes to (SOURCE_PUB);
-- pgoutput requires one (wal2json does not)
DROP PUBLICATION IF EXISTS cdc2vec;
CREATE PUBLICATION cdc2vec FOR TABLE public.documents;
