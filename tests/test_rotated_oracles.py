"""Round-7 rotation evidence: the ten ultra-stable queries rotated out
of individual registry slots (into x4_rowsonly_stable) keep their exact
DuckDB oracles pinned HERE at two scale factors, via the driver's own
comparator (oracle_check.compare_one) — so correctness evidence is
uninterrupted while the nine round-6 exact-oracle operators use the
freed slots (VERDICT r06 ask #2).
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import relational, text
from tests.conftest import SF0001, SF001

ROTATED = [
    ("t1_token_count", text),
    ("t2_quality_score", text),
    ("t3_lang_guess", text),
    ("t4_fingerprint", text),
    ("t5_regex_tokens", text),
    ("b1_scan_count", relational),
    ("b11_topk", relational),
    ("b12_intersect", relational),
    ("b13_scalar_funcs", relational),
    ("b14_json_extract", relational),
]


@pytest.mark.parametrize("sf", [SF0001, SF001])
@pytest.mark.parametrize("name,mod", ROTATED, ids=[n for n, _ in ROTATED])
def test_rotated_query_matches_duckdb_oracle(spark, sf, name, mod):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, name, mod.QUERIES[name], mod.ORACLES[name], sf
    )
    assert not problems, (name, sf, problems)
