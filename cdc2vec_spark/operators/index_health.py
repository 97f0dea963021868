"""Index-health loop for the incremental IVF index: measure → decide →
rebuild (SURVEY §2.2 group D extension; the reference ships vectors to
Qdrant/Milvus and has no index-quality feedback at all).

The problem this closes (VERDICT r08 ask #4): ``IncrementalIvfIndex``
keeps its centroids FROZEN after build — standard IVF practice, and CDC
keeps results *correct* (tombstones + exact verify), but a drifting
corpus slowly breaks the *quality* contract: newly inserted regions of
vector space have no nearby centroid, so their points spray across
cells whose centroids they barely match, and a query's ``nprobe``
nearest centroids stop containing its true neighbors → recall@k decays
and cell occupancy skews. Both signals are already measurable —
``stats()`` reports the occupancy imbalance, and the d35 machinery
(operators.retrieval_eval) established recall-vs-nprobe as the quality
curve — this module turns them into a decision plus the repair action.

Shape: cluster-side evaluation (every probe/scan is a Spark job over
the pruned index), driver-side decision (a dict of scalars). The
evaluation samples a deterministic handful of live vectors as queries
and compares the serving-depth probe against the full-probe exact
answer ON THE SAME INDEX, so the measured recall includes every real
artifact — tombstones, stale cells, assignment drift. Run it on an
operational cadence (every N batches / a cron), never per batch: the
recall probe costs 2·n_queries small jobs and the rebuild is O(index).

Usage::

    decision = rebuild_policy(ix)          # measure + decide
    if decision["rebuild"]:
        ix.rebuild(centroid_every=31)      # retrain on live survivors

or in one call: ``maybe_rebuild(ix)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from .ann_index import IncrementalIvfIndex


def index_recall(
    ix: IncrementalIvfIndex,
    n_queries: int = 10,
    k: int = 10,
    nprobe: int = 4,
) -> float:
    """Mean recall@k of the index at serving probe depth, measured
    against ITS OWN full-probe answer (the exact cosine top-k over the
    live survivors — tombstones and all). Queries are the ``n_queries``
    lowest-id live vectors: deterministic, no RNG, and because they are
    corpus members they track exactly the regions the corpus actually
    occupies — a freshly drifted cluster immediately contributes
    queries that expose its missing centroids. Self-hits are excluded
    from both sides."""
    pts = ix.live_points()
    if pts is None:
        raise ValueError(f"empty index at {ix.path}")
    qrows = (
        pts.select(ix.id_col, ix.vec_col)
        .orderBy(ix.id_col)
        .limit(n_queries)
        .collect()
    )
    if not qrows:
        raise ValueError(f"no live vectors at {ix.path}")
    hits = total = 0
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        not_self = F.col(ix.id_col) != r[0]
        exact = {
            x[0]
            for x in ix.topk(qv, k=k, nprobe=1_000_000, predicate=not_self)
            .select(ix.id_col).collect()
        }
        if not exact:
            continue
        approx = {
            x[0]
            for x in ix.topk(qv, k=k, nprobe=nprobe, predicate=not_self)
            .select(ix.id_col).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    return hits / total if total else 1.0


def recall_curve(
    ix: IncrementalIvfIndex,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    n_queries: int = 10,
    k: int = 10,
) -> dict[int, float]:
    """recall@k at each probe depth — the d35 quality curve measured on
    the live index (retrieval_eval computes the same curve corpus-side
    in one pass for offline evaluation; this is the serving-side probe
    for the health cadence). The probe-invariant full-probe exact
    answer is computed ONCE per query and reused across every curve
    point — it is the O(index) part, and recomputing it per depth
    would multiply the dominant cost by |nprobes|."""
    pts = ix.live_points()
    if pts is None:
        raise ValueError(f"empty index at {ix.path}")
    qrows = (
        pts.select(ix.id_col, ix.vec_col)
        .orderBy(ix.id_col)
        .limit(n_queries)
        .collect()
    )
    if not qrows:
        raise ValueError(f"no live vectors at {ix.path}")
    hits = {p: 0 for p in nprobes}
    total = 0
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        not_self = F.col(ix.id_col) != r[0]
        exact = {
            x[0]
            for x in ix.topk(qv, k=k, nprobe=1_000_000, predicate=not_self)
            .select(ix.id_col).collect()
        }
        if not exact:
            continue
        total += len(exact)
        for p in nprobes:
            approx = {
                x[0]
                for x in ix.topk(qv, k=k, nprobe=p, predicate=not_self)
                .select(ix.id_col).collect()
            }
            hits[p] += len(exact & approx)
    return {p: (hits[p] / total if total else 1.0) for p in nprobes}


def rebuild_policy(
    ix: IncrementalIvfIndex,
    max_imbalance: float = 5.0,
    min_recall: float = 0.7,
    nprobe: int = 4,
    n_queries: int = 10,
    k: int = 10,
) -> dict:
    """Measure the index and decide whether an offline retrain/rebuild
    is due. Triggers on EITHER signal:

    - occupancy imbalance (``stats()['imbalance']`` = max/avg cell) above
      ``max_imbalance``: some region's points pile into hot cells the
      frozen centroids under-serve — probe cost explodes with the hot
      cell and recall decays around it (the stats() docstring's
      rebuild-is-due heuristic, now enforced);
    - recall@k at the serving ``nprobe`` below ``min_recall``: the
      direct quality contract, measured on the live index.

    Returns ``{rebuild, reasons, stats, recall}`` — scalars only, so the
    decision can be logged/exported verbatim (healthz-style). An index
    whose live set drained to zero (tombstones only) is a LEGAL state:
    the policy reports it without recommending a rebuild (there is
    nothing to retrain on) instead of crashing the health cadence."""
    stats = ix.stats()
    if stats["n_live"] == 0:
        return {
            "rebuild": False,
            "reasons": ["live set empty (tombstones only) — nothing to retrain"],
            "stats": stats,
            "recall": None,
        }
    reasons: list[str] = []
    if stats["imbalance"] > max_imbalance:
        reasons.append(
            f"imbalance {stats['imbalance']} > {max_imbalance} "
            f"(max_cell {stats['max_cell']} vs avg {stats['avg_cell']})"
        )
    recall = index_recall(ix, n_queries=n_queries, k=k, nprobe=nprobe)
    if recall < min_recall:
        reasons.append(
            f"recall@{k} {recall:.3f} < {min_recall} at nprobe={nprobe}"
        )
    return {
        "rebuild": bool(reasons),
        "reasons": reasons,
        "stats": stats,
        "recall": round(recall, 4),
    }


def maybe_rebuild(
    ix: IncrementalIvfIndex,
    centroid_every: int = 31,
    **policy_kwargs,
) -> dict:
    """One-call cadence hook: evaluate ``rebuild_policy`` and, when it
    triggers, retrain+rebuild from the live survivors. Returns the
    decision dict with ``executed`` set."""
    decision = rebuild_policy(ix, **policy_kwargs)
    if decision["rebuild"]:
        ix.rebuild(centroid_every=centroid_every)
    decision["executed"] = decision["rebuild"]
    return decision
