"""Property-based tests (hypothesis) for the pure-Python primitives whose
exactness the engine depends on: FNV-1a parity, the deterministic
embedding provider, and Debezium JSON decoding round-trips.

Spark is intentionally absent here — each property runs hundreds of
examples; these primitives are plain functions.
"""

from __future__ import annotations

import json

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc2vec_spark.embed.provider import DeterministicHashProvider
from cdc2vec_spark.sinks.qdrant import fnv1a64_py

# --- FNV-1a 64 (qdrant.go:174-179 parity) --------------------------------

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def _fnv_reference(s: str) -> int:
    h = FNV_OFFSET
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_fnv1a64_matches_reference_algorithm(s):
    assert fnv1a64_py(s) == _fnv_reference(s)


# --- deterministic embedding provider (M1/A8) ----------------------------

@given(st.text(max_size=500), st.integers(min_value=1, max_value=128))
@settings(max_examples=100, deadline=None)
def test_hash_provider_properties(text, dim):
    p = DeterministicHashProvider(dim=dim)
    v1, v2 = p.embed_one(text), p.embed_one(text)
    assert np.array_equal(v1, v2)  # pure function
    assert v1.shape == (dim,) and v1.dtype == np.float32
    assert float(np.max(np.abs(v1))) <= 1.0  # range [-1, 1]


@given(st.text(min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_hash_provider_prefix_independence(text):
    """dim-d vector is a prefix of the dim-2d vector (block construction)."""
    short = DeterministicHashProvider(dim=16).embed_one(text)
    long = DeterministicHashProvider(dim=32).embed_one(text)
    assert np.array_equal(short, long[:16])


# --- Debezium payload shaping (no Spark: JSON-level invariants) ----------

_scalar = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(max_size=20),
    st.booleans(),
)


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=10).filter(lambda k: k.isidentifier()),
        _scalar,
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_debezium_payload_roundtrips_as_json(after):
    """Any scalar row image survives the JSON envelope (the engine decodes
    every value to string — SURVEY §1.2's everything-is-text model)."""
    evt = {"op": "c", "after": after, "source": {"schema": "s", "table": "t", "lsn": 1}}
    decoded = json.loads(json.dumps(evt))
    assert set(decoded["after"]) == set(after)
