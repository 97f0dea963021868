"""Dump the full `.explain("formatted")` physical plan of every
registry + component query to plans/r15/<query>_<tag>.txt.

Optimization-round evidence (round 15): run once with tag=before at the
round's starting commit and tag=after at the end; the judge diffs the
pair against the claims in OPTIMIZATION_r15.md.

    python tools/dump_plans_r15.py before [query ...]
    python tools/dump_plans_r15.py after  [query ...]

Plans are captured at sf0.01 on local[8] (the PLANS.md conditions) with
expression IDs left intact — raw evidence, not the curated PLANS.md
rendering. REPO resolves to this file's parent repo, overridable with
$SPARK_GRAFT_REPO so the tool can run from a detached historical
checkout to capture the before-plans.
"""

from __future__ import annotations

import os
import sys

REPO = os.environ.get(
    "SPARK_GRAFT_REPO",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    from cdc2vec_spark.session import get_spark

    spark = get_spark("plans-r15", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    from cdc2vec_spark.operators import composite

    qs = {**em.queries(), **composite.component_queries()}
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    outdir = os.path.join(REPO, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    sf = "/root/testdata/sf0.01"
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — capture what we can, note the rest
            plan = f"<plan capture failed: {e}>"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
