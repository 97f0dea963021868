"""Data-quality expectations audit — the Deequ / Great-Expectations
shape (Schelter et al. 2018, "Automating Large-Scale Data Quality
Verification", VLDB): declarative constraints over a table, evaluated
as metrics with a pass/fail verdict per rule. The step every production
ingest runs BEFORE data reaches training or a sink — the reference
pipes rows through unchecked (SURVEY §1: no validation surface at all).

Spark-first shape, sized for scale:

- every SCALAR rule (not_null / range / accepted_values / unique /
  row_count_min) folds into ONE aggregate pass over the table — a
  single wide Aggregate row computes all violation counters at once
  (conditional sums, count(*), count_distinct), then unpivots to one
  row per rule via ``stack``; adding rules adds columns to the same
  pass, never jobs;
- UNIQUE is count(*) − count_distinct(key...): exact, no self-join, no
  groupBy-then-filter second shuffle (rows with a NULL key component
  are not counted — pair with not_null, documented);
- each REFERENTIAL-INTEGRITY rule is one left-anti join count against
  its reference table (broadcast when the dim is small — Catalyst's
  call via AQE);
- all verdicts union into one (rule, violations, passed) frame, ordered
  — integer counters only, so the audit is exactly SQL-portable.

The graded entry (d41_expectations) audits lineitem against seven
rules, two of which genuinely fail on the fixture (a tightened discount
range and a single-status whitelist) so the report exercises both
verdict branches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def _scalar_counter(rule: dict) -> Column:
    t = rule["type"]
    if t == "not_null":
        c = F.col(rule["col"])
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if t == "range":
        c = F.col(rule["col"])
        bad = c.isNotNull() & ((c < rule["lo"]) | (c > rule["hi"]))
        return F.sum(F.when(bad, 1).otherwise(0))
    if t == "accepted_values":
        c = F.col(rule["col"])
        bad = c.isNotNull() & ~c.isin(*rule["values"])
        return F.sum(F.when(bad, 1).otherwise(0))
    if t == "unique":
        # duplicates among rows whose EVERY key component is non-null
        # (count_distinct skips null keys, so the minuend must too —
        # pair with not_null to police the keys themselves)
        nonnull = F.lit(True)
        for c in rule["cols"]:
            nonnull = nonnull & F.col(c).isNotNull()
        return F.sum(F.when(nonnull, 1).otherwise(0)) - F.count_distinct(
            *[F.col(c) for c in rule["cols"]]
        )
    if t == "row_count_min":
        return F.greatest(
            F.lit(rule["min"]).cast("long") - F.count(F.lit(1)), F.lit(0)
        )
    raise ValueError(f"unknown expectation type: {t!r}")


def run_expectations(
    df: DataFrame,
    rules: Sequence[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate expectation ``rules`` over ``df`` → one row per rule:
    ``(rule, violations, passed)``, ordered by rule name.

    Rule dicts: ``{"name", "type", ...}`` with type ∈
    not_null(col) / range(col, lo, hi) / accepted_values(col, values) /
    unique(cols) / row_count_min(min) /
    ref_integrity(col, ref, ref_col) — ``ref`` naming a table in
    ``refs``. Every rejection happens at build time, never mid-job."""
    names = [r["name"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    scalar = [r for r in rules if r["type"] != "ref_integrity"]
    ri = [r for r in rules if r["type"] == "ref_integrity"]
    for r in ri:  # validate refs at build time
        if refs is None or r["ref"] not in refs:
            raise ValueError(f"rule {r['name']!r}: unknown ref table {r.get('ref')!r}")

    parts: list[DataFrame] = []
    if scalar:
        wide = df.agg(
            *[
                _scalar_counter(r).cast("long").alias(f"_v{i}")
                for i, r in enumerate(scalar)
            ]
        )
        stack = ", ".join(
            f"'{r['name']}', _v{i}" for i, r in enumerate(scalar)
        )
        parts.append(
            wide.selectExpr(
                f"stack({len(scalar)}, {stack}) AS (rule, violations)"
            )
        )
    for r in ri:
        ref = refs[r["ref"]].select(F.col(r["ref_col"]).alias(r["col"]))
        orphans = (
            df.where(F.col(r["col"]).isNotNull())
            .join(ref, r["col"], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(F.lit(r["name"]).alias("rule"), "violations")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "violations", (F.col("violations") == 0).alias("passed")
    ).orderBy("rule")


# ------------------------------------------------- graded entry (D41)

_D41_RULES = [
    {"name": "r1_orderkey_not_null", "type": "not_null", "col": "l_orderkey"},
    {"name": "r2_line_unique", "type": "unique",
     "cols": ("l_orderkey", "l_linenumber")},
    {"name": "r3_discount_range", "type": "range",
     "col": "l_discount", "lo": 0.0, "hi": 0.05},
    {"name": "r4_returnflag_values", "type": "accepted_values",
     "col": "l_returnflag", "values": ("A", "N", "R")},
    {"name": "r5_linestatus_open", "type": "accepted_values",
     "col": "l_linestatus", "values": ("O",)},
    {"name": "r6_order_ref", "type": "ref_integrity",
     "col": "l_orderkey", "ref": "orders", "ref_col": "o_orderkey"},
    {"name": "r7_min_rows", "type": "row_count_min", "min": 100},
]


def d41_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D41 (added round 10) — the seven-rule lineitem audit: one scan
    pass for the six scalar rules + one anti-join for the orders
    referential check. r3 and r5 fail on the fixture by design."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return run_expectations(li, _D41_RULES, refs={"orders": orders})


_D41_ORACLE = """
WITH scalar AS (
  SELECT
    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r1,
    CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
             THEN 1 ELSE 0 END)
         - count(DISTINCT CASE WHEN l_orderkey IS NOT NULL
                                AND l_linenumber IS NOT NULL
                          THEN (l_orderkey, l_linenumber) END)
         AS BIGINT) AS r2,
    CAST(sum(CASE WHEN l_discount IS NOT NULL
                   AND (l_discount < 0.0 OR l_discount > 0.05)
             THEN 1 ELSE 0 END) AS BIGINT) AS r3,
    CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                   AND l_returnflag NOT IN ('A', 'N', 'R')
             THEN 1 ELSE 0 END) AS BIGINT) AS r4,
    CAST(sum(CASE WHEN l_linestatus IS NOT NULL AND l_linestatus <> 'O'
             THEN 1 ELSE 0 END) AS BIGINT) AS r5,
    CAST(greatest(100 - count(*), 0) AS BIGINT) AS r7
  FROM lineitem
), ri AS (
  SELECT CAST(count(*) AS BIGINT) AS r6
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
), rows_out AS (
  SELECT 'r1_orderkey_not_null' AS rule, r1 AS violations FROM scalar
  UNION ALL SELECT 'r2_line_unique', r2 FROM scalar
  UNION ALL SELECT 'r3_discount_range', r3 FROM scalar
  UNION ALL SELECT 'r4_returnflag_values', r4 FROM scalar
  UNION ALL SELECT 'r5_linestatus_open', r5 FROM scalar
  UNION ALL SELECT 'r6_order_ref', r6 FROM ri
  UNION ALL SELECT 'r7_min_rows', r7 FROM scalar
)
SELECT rule, violations, violations = 0 AS passed
FROM rows_out ORDER BY rule
"""

QUERIES = {"d41_expectations": d41_expectations}
# round-10 addition: composite-delivered (x1), oracle pinned at two SFs
# in tests/test_expect.py; rotation candidate
ORACLES = {"d41_expectations": _D41_ORACLE}
