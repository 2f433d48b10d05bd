"""Memoized pure-Column builders (round-15 optimization).

A ``Column`` built purely from literals and column NAMES is an
immutable *unresolved* expression tree: embedding the same instance
into any number of plans is exactly as safe as calling the builder
again (resolution and expression-ID assignment happen per-plan at
analysis), and skips the py4j round-trips that dominate construction
time of the regex/HOF-heavy operators. Measured on the round-15
corpus-funnel profile: rebuilding the URL-gate + extraction +
annotate expression forests cost ~1-1.5 s of driver time per bench
pass — pure fixed cost repeated per query construction, with an
identical plan every time.

The decorator only caches calls whose EVERY argument is plain data
(str/int/float/bool/None, or tuples of those): a call that passes a
``Column`` (or any other unhashable/stateful object) falls through to
the undecorated builder, so call sites that compose stored column
refs keep their exact semantics. Nothing session-scoped is cached —
no DataFrames, no broadcasts, no plans — only expression trees, which
are JVM-process-wide values independent of any SparkSession.
"""

from __future__ import annotations

import functools

_PLAIN = (str, int, float, bool, bytes, type(None))

# sentinel: argument is not plain data -> bypass the cache
_OPAQUE = object()


def _canon(x):
    """Canonical hashable key for plain data, ``_OPAQUE`` otherwise.
    Lists and dicts are accepted as VALUES (several builders take a
    tiers list / score mapping) and canonicalized to tuples — safe
    because the builders never mutate them and the produced expression
    depends only on their contents."""
    if isinstance(x, _PLAIN):
        return x
    if isinstance(x, (tuple, list)):
        out = tuple(_canon(e) for e in x)
        return _OPAQUE if _OPAQUE in out else ("t", out)
    if isinstance(x, (frozenset, set)):
        out = tuple(sorted((_canon(e) for e in x), key=repr))
        return _OPAQUE if _OPAQUE in out else ("s", out)
    if isinstance(x, dict):
        out = tuple(sorted(((k, _canon(v)) for k, v in x.items()), key=repr))
        return _OPAQUE if any(v is _OPAQUE for _, v in out) else ("d", out)
    return _OPAQUE


def _gateway_key():
    """Identity of the live py4j gateway, or None before any context
    exists. Cached Columns hold JVM object handles through this
    gateway: an in-process SparkContext stop/restart builds a NEW
    gateway, and a Column cached against the old one would carry
    stale handles (round-16, VERDICT r15). Keying every cache entry
    on the gateway makes such entries unreachable instead of wrong;
    the dead entries are dim-sized and restarts are rare, so no
    eviction is needed."""
    try:
        from pyspark import SparkContext

        gw = SparkContext._gateway
    except Exception:  # pragma: no cover - import-order edge
        gw = None
    return id(gw) if gw is not None else None


def memo_column(fn):
    """Cache ``fn(*args, **kwargs) -> Column`` for plain-data calls.

    Unbounded per distinct argument tuple — the builders this wraps
    are called with a handful of distinct (column-name, literal)
    combinations per application, so the cache stays dim-sized; a
    pathological caller generating unbounded distinct literals would
    merely re-create what it already paid for before the cache
    existed. Entries are additionally keyed on the active py4j
    gateway (:func:`_gateway_key`) so a context restart can never
    serve a Column holding handles into a dead JVM.
    """
    cache: dict = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        cargs = tuple(_canon(a) for a in args)
        ckw = tuple(sorted((k, _canon(v)) for k, v in kwargs.items()))
        if _OPAQUE not in cargs and all(v is not _OPAQUE for _, v in ckw):
            key = (_gateway_key(), cargs, ckw)
            hit = cache.get(key)
            if hit is None:
                hit = cache[key] = fn(*args, **kwargs)
            return hit
        return fn(*args, **kwargs)

    wrapper.__wrapped__ = fn
    return wrapper
