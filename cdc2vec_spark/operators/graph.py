"""Iterative graph analytics over operator-derived edge sets — PageRank
(Page et al. 1999) as a DataFrame-native fixed-point loop, the second
iterative algorithm family in the engine next to connected components
(`dedup.connected_components`). The reference has nothing like it;
SURVEY §2.2 group D extension.

Use case here: centrality in the near-duplicate similarity graph — a
high-rank document is a hub its whole neighborhood varies around (a
template, a boilerplate source, the canonical copy), exactly the
node a curation team inspects first when a dedup cluster is large.
The edge derivation is the already-audited exact blocked-Jaccard pair
set (the graded d2_blocked / d9_keep_exact form), so the graph itself
is deterministic and oracle-mirrored.

Spark-first shape for 100 TB:
- The symmetrized edge list (with out-degree attached) is built once
  and localCheckpoint-ed; every iteration reuses it, partitioned the
  same way, so the per-iteration cost is ONE shuffle (the contribution
  groupBy on dst) plus a keyed join against the |nodes|-row rank frame.
- Each iteration references the previous one exactly once, so lineage
  grows LINEARLY and the whole fixed-point chain executes as one job;
  only the subtrees that are re-referenced every round (the edge list,
  the node set) are localCheckpoint-ed. (connected_components still
  checkpoints per round — there each round references the previous
  frame several times, which is the case where lineage would explode.)
- A FIXED iteration count (no convergence collect) keeps the loop
  driver-decision-free and lets the DuckDB oracle mirror it exactly as
  an unrolled chain of CTEs.

Fixed-point discipline (d13/d17): ranks are integer micro-units; the
update is ``r' = 150_000 + (85 · Σ floor(r_v / outdeg_v)) div 100``
(the per-node form of damping 0.85 at a 1e6 scale) — every operand a
BIGINT, every division a floor over positives, so Spark and DuckDB
agree bit-for-bit and the result is partitioning- and retry-invariant
(a float PageRank is not: sum order changes ULPs and rank ties flip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import D2_MAX_DF, _CORPUS_CTE, neardup_pairs_shared

_ITERS = 5
_R0 = 1_000_000  # initial rank, micro-units
_BASE = 150_000  # (1 - damping) * 1e6
_DAMP_PCT = 85   # damping * 100


def pagerank(
    pairs: DataFrame,
    iters: int = _ITERS,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Integer-exact PageRank over the undirected graph given by
    ``pairs``: returns (id, rank_micro) for every node with at least one
    edge, ordered by id. Isolated docs never enter the graph — their
    rank is the uninformative base and reporting them would only pad
    the result."""
    # symmetrize with ONE explode, not union(e, e.swapped): a union
    # references the (possibly expensive) pair-derivation subtree twice
    # and executes it twice — measured 2x the d2_blocked wall at sf0.1
    e = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                ),
                F.struct(
                    F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    edges = e.join(deg, "src").localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(_R0).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    nodes = ranks.select("id")
    # the loop builds ONE lazy plan: iteration i references iteration
    # i-1 exactly once (and the checkpointed edges/nodes leaves), so
    # lineage grows linearly and everything executes as a single job —
    # the old per-iteration eager localCheckpoint serialized `iters`
    # materialization jobs whose wall was pure scheduler floor (round
    # 14; the checkpoints that prevent real re-execution, edges and the
    # initial ranks, stay)
    for _ in range(iters):
        contrib = edges.join(ranks, edges["src"] == ranks["id"]).select(
            F.col("dst"), F.expr("r div outdeg").alias("c")
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, nodes["id"] == sums["dst"], "left").select(
            "id",
            (
                F.lit(_BASE)
                + F.expr(f"({_DAMP_PCT} * coalesce(s, 0L)) div 100")
            ).cast("long").alias("r"),
        )
    return ranks.select("id", F.col("r").alias("rank_micro")).orderBy("id")


def d44_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D44 (added round 10) — PageRank centrality of the exact near-dup
    similarity graph over the derived corpus (the d9_keep_exact edge
    set), 5 integer-exact iterations. The edge set comes from the shared
    graph stage (dedup.neardup_pairs_shared) — derived once per session
    for the whole d9/d44/d46/d47/d48 family."""
    pairs = neardup_pairs_shared(spark, sf_dir)
    return pagerank(pairs).withColumnRenamed("id", "doc_id")


def _pair_cte() -> str:
    """The graded d2_blocked pair derivation (verbatim from the d9
    oracle) — the shared edge source."""
    return _CORPUS_CTE + f"""
, ex AS (SELECT doc_id, source, unnest(shingles) AS g FROM sh),
freq AS (SELECT source, g, count(*) AS df FROM ex GROUP BY source, g),
kept AS (
  SELECT e.doc_id, e.source, e.g FROM ex e
  JOIN freq USING (source, g) WHERE freq.df <= {D2_MAX_DF}
),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM kept a JOIN kept b ON a.source = b.source AND a.g = b.g
                         AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jac
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
  ) t WHERE jac >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT src AS id, CAST({_R0} AS BIGINT) AS r FROM deg)
"""


def _iter_cte(k: int) -> str:
    """One unrolled PageRank step: it{k} from it{k-1} (r0 for k=1)."""
    prev = "r0" if k == 1 else f"it{k - 1}"
    return f"""
it{k} AS (
  SELECT d.src AS id,
         CAST({_BASE} + ({_DAMP_PCT} * CAST(coalesce(s.s, 0) AS BIGINT)) // 100
              AS BIGINT) AS r
  FROM deg d LEFT JOIN (
    SELECT e.dst, CAST(sum(p.r // d2.outdeg) AS BIGINT) AS s
    FROM edges e
    JOIN {prev} p ON p.id = e.src
    JOIN deg d2 ON d2.src = e.src
    GROUP BY e.dst
  ) s ON s.dst = d.src
)"""


D44_ORACLE_SQL = (
    _pair_cte()
    + ","
    + ",".join(_iter_cte(k) for k in range(1, _ITERS + 1))
    + f"\nSELECT id AS doc_id, r AS rank_micro FROM it{_ITERS} ORDER BY doc_id"
)

# round-10 addition: composite-delivered (x2), exact oracle pinned at two
# SFs in tests/test_graph.py; rotation candidate for round 11
QUERIES = {"d44_pagerank": d44_pagerank}
ORACLES = {"d44_pagerank": D44_ORACLE_SQL}
