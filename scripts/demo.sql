-- Demo change feed — the "test.sql" the reference's setup-demo.sh
-- copies into the Postgres container but never committed
-- (/root/reference/scripts/setup-demo.sh:8). Run it after the stack is
-- up to watch inserts/updates/deletes flow through the engine into the
-- sink:
--
--   docker exec -i $(docker ps -qf name=postgres) \
--       psql -U postgres -d testdb < scripts/demo.sql

INSERT INTO public.documents (id, title, content, author) VALUES
  (1, 'Getting started', 'Change data capture turns a database into a stream.', 'ada'),
  (2, 'Vector search',   'Embeddings map text into a metric space.',            'grace'),
  (3, 'Stream joins',    'Late data needs watermarks to bound state.',          'ada');

-- an update re-embeds and upserts the same point id (tbl:pk)
UPDATE public.documents
   SET content = 'Change data capture turns a database into an ordered stream of row changes.'
 WHERE id = 1;

-- a delete removes the point from the sink
DELETE FROM public.documents WHERE id = 3;

-- empty text is skipped by the F2 guard (no point written, no error)
INSERT INTO public.documents (id, title, content, author) VALUES
  (4, '', '', 'nobody');
