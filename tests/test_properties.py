"""Property-based tests (hypothesis) for the engine's determinism
contracts — the invariants the oracle gate depends on."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from open_data_pipelines_spark.functions.cleaning import normalize_column_name
from open_data_pipelines_spark.sources.discovery import monthly_links

# pure-python properties (no Spark session — fast)


@given(st.floats(min_value=0, max_value=1e9, allow_nan=False, allow_infinity=False))
def test_round_half_up_formula_properties(x):
    # the floor-based formula the engine uses on BOTH engines; domain
    # bounded to the documented money range (numeric.py: |x*100| must
    # stay well under 2^53 — float spacing breaks the bound near 1e12,
    # which hypothesis duly found)
    r = math.floor(x * 100 + 0.5) / 100
    assert abs(r - x) <= 0.005 + 1e-6
    assert r >= 0


@given(
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" -/()'\""),
        min_size=1,
        max_size=40,
    )
)
def test_normalize_column_name_idempotent_and_clean(name):
    once = normalize_column_name(name)
    assert normalize_column_name(once) == once  # idempotent
    assert once == once.lower()
    assert " " not in once and "-" not in once and "(" not in once
    assert not once.startswith("_") and not once.endswith("_")


@given(
    st.integers(min_value=2000, max_value=2030),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=60)
def test_monthly_links_contiguous(y, m, span):
    end_y, end_m = y + (m - 1 + span) // 12, (m - 1 + span) % 12 + 1
    links = monthly_links("u", (y, m), (end_y, end_m))
    assert len(links) == span + 1
    assert links[0] == f"u/{y}/{m:02d}.zip"
    assert len(set(links)) == len(links)


def test_affine_minhash_permutations_distinct():
    from open_data_pipelines_spark.operators.text_dedup import _MERSENNE_31, _affine_params

    # permutations must be distinct bijections mod M
    seen = set()
    for j in range(64):
        a, b = _affine_params(j)
        assert math.gcd(a, _MERSENNE_31) == 1  # bijection on Z_M
        assert (a, b) not in seen
        seen.add((a, b))


@given(st.lists(st.integers(min_value=0, max_value=2**52 - 1), min_size=1, max_size=50))
def test_affine_minhash_bounds(hs):
    from open_data_pipelines_spark.operators.text_dedup import _MERSENNE_31, _affine_params

    for j in range(8):
        a, b = _affine_params(j)
        vals = [(a * h + b) % _MERSENNE_31 for h in hs]
        assert all(0 <= v < _MERSENNE_31 for v in vals)
        assert all(a * h + b < 2**63 for h in hs)  # no int64 overflow
