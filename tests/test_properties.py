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


# --- corpus sampling / packing arithmetic (pure python, no Spark) ----------


@given(
    st.dictionaries(
        st.sampled_from(["web", "code", "books", "wiki", "forums"]),
        st.integers(min_value=1, max_value=10_000_000),
        min_size=1,
        max_size=5,
    ),
    st.dictionaries(
        st.sampled_from(["web", "code", "books", "wiki", "forums"]),
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=5,
    ),
)
def test_mix_fractions_properties(counts, weights):
    from open_data_pipelines_spark.operators.sampling import mix_fractions

    weights = {s: w for s, w in weights.items() if s in counts}
    if not weights:
        return
    fracs = mix_fractions(counts, weights)
    # downsample-only: every fraction in [0, 1]
    assert all(-1e-12 <= f <= 1.0 + 1e-9 for f in fracs.values())
    # zero-weight strata are dropped entirely
    assert all(fracs[s] == 0.0 for s in counts if s not in weights)
    # expected kept counts reproduce the target mix exactly
    wsum = sum(weights.values())
    kept = {s: counts[s] * fracs[s] for s in weights}
    total = sum(kept.values())
    if total > 0:
        for s, w in weights.items():
            assert abs(kept[s] / total - w / wsum) < 1e-6
    # maximality: the binding stratum is kept whole (fraction == 1)
    assert any(abs(fracs[s] - 1.0) < 1e-9 for s in weights)


@given(
    st.lists(st.integers(min_value=1, max_value=150), min_size=1, max_size=200),
    st.integers(min_value=50, max_value=200),
)
def test_greedy_packing_reference_properties(tokens, budget):
    """The sequential greedy rule pack() implements, checked abstractly:
    conservation, budget except oversize singletons, and the 2x waste
    bound (any two consecutive packs exceed the budget together)."""
    seq, run, packs = 0, 0, {}
    for t in tokens:
        if run > 0 and run + t > budget:
            seq, run = seq + 1, 0
        packs.setdefault(seq, []).append(t)
        run += t
    sizes = {i: sum(v) for i, v in packs.items()}
    assert sum(len(v) for v in packs.values()) == len(tokens)
    for i, s in sizes.items():
        assert s <= budget or len(packs[i]) == 1
    for i in range(len(sizes) - 1):
        # greedy never closes a pack that had room for the next item
        assert sizes[i] + packs[i + 1][0] > budget
