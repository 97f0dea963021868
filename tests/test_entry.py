"""Driver-contract guards: the __spark_entry__ registry must stay complete
and self-consistent, so a silent drop (import error, registry drift, a
query the driver never grades) fails the suite loudly instead of showing
up as a quietly shorter CORRECTNESS file.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

from oracle_check import EXPECTED_QUERIES, check_registry  # noqa: E402


def test_registry_complete():
    qs = entrymod.queries()
    check_registry(qs)
    assert len(qs) == len(EXPECTED_QUERIES)


def test_oracles_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracle_sql() has entries with no query: {sorted(orphans)}"


def test_every_query_callable():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name


@pytest.mark.parametrize("rows_only", [
    # documented rows-only (no SQL oracle) set — additions to this list
    # need a pinned engine test per SURVEY §5; removals should convert the
    # entry to a full oracle row
    {"a8_deterministic_embed", "a9_points_pipeline", "b16_sketches", "c4_watermark",
     "d2_minhash_lsh", "d2_simhash", "d3_ivf_topk", "d3_hyperplane_topk",
     "d6_features", "d8_lsh_neardup", "d9_keep_canonical"}
])
def test_rows_only_set_is_exactly_documented(rows_only):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    actual = set(qs) - set(oracles)
    assert actual == rows_only, (
        f"rows-only drift: newly_missing_oracle={sorted(actual - rows_only)} "
        f"gained_oracle={sorted(rows_only - actual)}"
    )
