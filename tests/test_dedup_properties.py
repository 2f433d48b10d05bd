"""Property tests: the distributed paragraph / substring dedup
operators against brute-force pure-Python oracles over randomized
small corpora (hypothesis). Catches boundary shapes the hand
fixtures don't reach: single-token docs, all-identical corpora,
overlap chains, duplicate windows inside AND across docs at once.

Spark round-trips are slow, so examples are kept small and few; the
oracles are direct definitions, not re-implementations of the
operator's algebra (interval merging is re-derived from window
coverage sets, keep-first from a dict scan)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from open_data_pipelines_spark.operators.paragraph_dedup import paragraph_keep_flags
from open_data_pipelines_spark.operators.substring_dedup import (
    duplication_stats,
    remove_duplicated_spans,
)

# small vocab forces genuine collisions; short docs keep Spark fast
_VOCAB = ["a", "b", "c"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)

K = 3


def _windows(tokens):
    return [tuple(tokens[i : i + K]) for i in range(len(tokens) - K + 1)]


def _covered_dup_tokens(corpus):
    """Brute force: per doc, the set of token positions covered by a
    window whose content occurs >= 2 times corpus-wide, EXCLUDING the
    globally first occurrence of each window (keep_one semantics)."""
    occs: dict[tuple, list] = {}
    toks = [d.split() if d.split() else [] for d in corpus]
    for di, t in enumerate(toks):
        for s, w in enumerate(_windows(t)):
            occs.setdefault(w, []).append((di, s))
    covered = [set() for _ in corpus]
    for w, lst in occs.items():
        if len(lst) < 2:
            continue
        first = min(lst)
        for di, s in lst:
            if (di, s) == first:
                continue
            covered[di].update(range(s, s + K))
    return toks, covered


@settings(max_examples=25, deadline=None)
@given(_corpus)
def test_substring_stats_match_bruteforce(spark, corpus):
    toks, covered = _covered_dup_tokens(corpus)
    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplication_stats(df, "text", "doc_id", k=K, fast=True).collect()
    }
    for di in range(len(corpus)):
        assert got[di] == (len(toks[di]), len(covered[di])), (corpus, di)


@settings(max_examples=15, deadline=None)
@given(_corpus)
def test_substring_removal_keeps_exactly_uncovered(spark, corpus):
    toks, covered = _covered_dup_tokens(corpus)
    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_spans(df, "text", "doc_id", k=K, fast=True).collect()
    }
    for di, t in enumerate(toks):
        expected = " ".join(tok for i, tok in enumerate(t) if i not in covered[di])
        assert got[di] == expected, (corpus, di)


_para_doc = st.lists(
    st.sampled_from(["x", "y", "z", ""]), min_size=0, max_size=4
).map("\n\n".join)
_para_corpus = st.lists(_para_doc, min_size=1, max_size=5)


@settings(max_examples=25, deadline=None)
@given(_para_corpus)
def test_paragraph_keep_first_matches_bruteforce(spark, corpus):
    # brute force: global first occurrence by (doc, pos) of each
    # non-blank paragraph keeps; all later occurrences drop
    seen = set()
    expect = {}
    for di, d in enumerate(corpus):
        pos = 0
        for p in d.split("\n\n"):
            p = p.strip()
            if not p:
                continue
            expect[(di, pos)] = p not in seen
            seen.add(p)
            pos += 1
    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = {
        (r["doc_id"], r["pos"]): r["keep"]
        for r in paragraph_keep_flags(df, "text", "doc_id", fast=True).collect()
    }
    assert got == expect, corpus


# --- cap_per_stratum against a brute-force oracle -------------------

_cap_corpus = st.lists(
    st.tuples(st.sampled_from(["w", "x", "y", None]), st.integers(0, 50)),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[1],  # doc_id unique (operator key contract)
)


@settings(max_examples=25, deadline=None)
@given(_cap_corpus, st.integers(1, 6))
def test_cap_per_stratum_matches_bruteforce(spark, rows, cap):
    """Expected mode == the row-local definition (keep iff the stratum
    is under cap OR unit_hash(key) < cap/n, NULL strata included);
    exact mode keeps exactly min(n, cap) per stratum and is a subset
    of the stratum's rows."""
    from open_data_pipelines_spark.operators.sampling import (
        cap_per_stratum,
        unit_hash,
    )

    df = spark.createDataFrame(
        [(d, i) for d, i in rows], "domain string, doc_id long"
    )
    hashes = {
        r["doc_id"]: r["u"]
        for r in df.select("doc_id", unit_hash("doc_id", "p").alias("u")).collect()
    }
    sizes: dict = {}
    for d, _ in rows:
        sizes[d] = sizes.get(d, 0) + 1
    want = {
        i for d, i in rows if sizes[d] <= cap or hashes[i] < cap / sizes[d]
    }
    got = {
        r[0]
        for r in cap_per_stratum(df, "domain", cap, "doc_id", seed="p")
        .select("doc_id")
        .collect()
    }
    assert got == want

    exact = cap_per_stratum(df, "domain", cap, "doc_id", seed="p", exact=True)
    by_dom: dict = {}
    for r in exact.collect():
        by_dom.setdefault(r["domain"], set()).add(r["doc_id"])
    all_ids = {d: {i for dd, i in rows if dd == d} for d in sizes}
    assert set(by_dom) <= set(all_ids)
    for d, n in sizes.items():
        kept = by_dom.get(d, set())
        assert len(kept) == min(n, cap)
        assert kept <= all_ids[d]
