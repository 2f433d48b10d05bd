"""Deterministic corpus sampling: train/val/test split assignment,
hash-threshold sampling, stratified (per-source) sampling, and
domain-mix rebalancing (engine extensions for training-data
pipelines; BASELINE.json north-star).

Why hash-threshold instead of ``df.sample`` / ``rand()``:

- **Reproducible by construction** — membership is a pure function of
  the row key and a seed string, identical across runs, partitionings,
  engines, and cluster sizes. ``rand()`` sampling changes with task
  scheduling; at 100 TB a re-run after a lost executor must not
  reshuffle the eval set.
- **Leak-proof splits** — a document's split follows its KEY, so
  re-ingesting the corpus (or growing it) never migrates an existing
  doc from train to test. This is the property eval hygiene actually
  needs; ``randomSplit`` has none of it.
- **Row-local** — every operator here is a projection/filter: no
  shuffle, no action, fully codegen'd, trivially pushed past scans.

The hash is the cross-engine-portable 60-bit md5 prefix
(:func:`~..functions.hashing.stable_long_hash`), so every operator is
DuckDB-oracle-checkable:
``('0x' || substr(md5(seed || key), 1, 15))::BIGINT / 2^60``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_long_hash

_TWO_60 = float(1 << 60)


def unit_hash(col: Column | str, seed: str = "") -> Column:
    """Deterministic uniform-ish value in [0, 1): the 60-bit stable
    hash scaled by 2^60. Same value computable in DuckDB (module
    docstring), so sampled sets are cross-engine comparable.

    NULL keys hash as one fixed sentinel instead of propagating NULL:
    a NULL hash made every sampler misbehave silently — upsample
    dropped the row entirely (even its guaranteed floor copies),
    assign_split routed it to the LAST split (eval contamination by
    junk rows), deterministic_sample dropped it at any fraction
    (round-9 review find). With the sentinel, NULL-key rows are
    deterministic and travel together — degenerate but visible.
    DuckDB mirror: wrap the key in COALESCE(x::VARCHAR, '<null-key>')."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.coalesce(c.cast("string"), F.lit("<null-key>"))
    return stable_long_hash(keyed, salt=seed) / F.lit(_TWO_60)


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a ``split`` label column by cumulative hash thresholds.

    The reference has no eval-split notion (it is an ELT warehouse);
    this is the training-data extension: stable partition of a corpus
    into train/val/test where membership is a pure function of
    (seed, key). Fractions must sum to 1 (the last split absorbs
    float residue so every row gets a label).
    """
    fracs = [f for _, f in splits]
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >=0 and sum to 1, got {splits}")
    u = unit_hash(key_col, seed)
    expr: Column | None = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        branch = F.when(u < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    last = F.lit(splits[-1][0])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep rows whose unit hash falls below ``fraction``.

    Nested property (useful for curriculum / scaling-law runs): for
    the same seed, the 1% sample is a subset of the 10% sample — a
    smaller run's corpus is always contained in the larger run's.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(unit_hash(key_col, seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "stratified",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling (deterministic ``sampleBy``).

    Domain mixing for corpus construction: each source/domain keeps an
    independent fraction of its rows; strata missing from ``fractions``
    keep ``default`` (0 drops them — the allowlist usage). One chained
    CASE on a broadcast-free literal map — still a pure filter.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1], got {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    thresh: Column = F.lit(default)
    col = F.col(stratum_col)
    for s, f in sorted(fractions.items()):
        thresh = F.when(col == F.lit(s), F.lit(f)).otherwise(thresh)
    return df.filter(unit_hash(key_col, seed) < thresh)


def mix_fractions(
    counts: dict[str, int], target_weights: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep-fractions that downsample a corpus to a target
    mix (driver-side arithmetic over per-stratum counts — #strata is
    small; the counts come from one tiny groupBy).

    Finds the largest corpus consistent with ``target_weights`` using
    only downsampling (no fraction exceeds 1): total is limited by the
    most over-demanded stratum, min over strata of count/weight.
    Strata absent from ``target_weights`` get 0.
    """
    if any(w < 0 for w in target_weights.values()):
        raise ValueError(f"weights must be >= 0, got {target_weights}")
    wsum = sum(target_weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    norm = {s: w / wsum for s, w in target_weights.items()}
    missing = [s for s, w in norm.items() if w > 0 and counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"strata with positive weight but no rows: {missing}")
    total = min(counts[s] / w for s, w in norm.items() if w > 0)
    return {s: (total * norm.get(s, 0.0)) / counts[s] for s in counts}


def repeat_factors(
    counts: dict[str, int], target_weights: dict[str, float], epochs_cap: float = 10.0
) -> dict[str, float]:
    """Per-stratum repetition factors that UPsample a corpus to a
    target mix (the complement of :func:`mix_fractions`): the largest
    stratum-to-weight ratio anchors at factor 1.0 (never discard), and
    under-represented strata repeat up to ``epochs_cap`` times (the
    data-repetition budget — repeating a small domain 100x degrades
    training, so the cap binds and the achieved mix is reported by the
    caller, not silently forced)."""
    if any(w < 0 for w in target_weights.values()):
        raise ValueError(f"weights must be >= 0, got {target_weights}")
    wsum = sum(target_weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    norm = {s: w / wsum for s, w in target_weights.items()}
    missing = [s for s, w in norm.items() if w > 0 and counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"strata with positive weight but no rows: {missing}")
    # anchor: the stratum with the most data per unit of weight stays at 1x
    total = max(counts[s] / w for s, w in norm.items() if w > 0)
    return {
        s: min(epochs_cap, (total * norm.get(s, 0.0)) / counts[s]) for s in counts
    }


def upsample_to_mix(
    df: DataFrame,
    stratum_col: str,
    target_weights: dict[str, float],
    key_col: str,
    seed: str = "epochs",
    epochs_cap: float = 10.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Repeat under-represented strata toward ``target_weights``
    without downsampling any positively-weighted stratum (domain
    upweighting by repetition — the standard alternative to
    downsampling when the small domain is the valuable one; strata
    with zero/absent weight are excluded, as in every mix op here).

    A factor f repeats every row floor(f) times and one extra time for
    a deterministic hash-selected f-frac fraction — expected mix hits
    the target (up to the epochs cap), rows gain ``copy_col`` (0-based
    repetition index) so downstream shuffling can separate copies.
    One tiny count agg + an explode; no other shuffle.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    factors = repeat_factors(counts, target_weights, epochs_cap)
    whole: Column = F.lit(0)
    frac: Column = F.lit(0.0)
    col = F.col(stratum_col)
    for s, f in sorted(factors.items()):
        whole = F.when(col == F.lit(s), F.lit(int(f))).otherwise(whole)
        frac = F.when(col == F.lit(s), F.lit(f - int(f))).otherwise(frac)
    n_copies = whole + (unit_hash(key_col, seed) < frac).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def shuffle_deterministic(
    df: DataFrame, key_col: str, seed: str = "shuffle", partitions: int | None = None
) -> DataFrame:
    """Global deterministic corpus shuffle: order rows by the keyed
    hash. Range-partition on the hash (near-uniform by construction)
    then sort within partitions — a total order across output files
    without a single-partition sort, reproducible across runs and
    cluster sizes. The serving-side 'shuffle the corpus once per seed'
    primitive; vary ``seed`` per epoch."""
    keyed = df.withColumn("__h", unit_hash(key_col, seed))
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, "__h").sortWithinPartitions("__h").drop("__h")
    )


def rebalance_to_mix(
    df: DataFrame,
    stratum_col: str,
    target_weights: dict[str, float],
    key_col: str,
    seed: str = "mix",
) -> DataFrame:
    """Downsample a corpus so the stratum proportions match
    ``target_weights`` (e.g. ``{"web": 0.6, "code": 0.3, "books":
    0.1}``), keeping as many rows as downsampling-only allows.

    Two passes: one map-side-combinable count per stratum (rows =
    #strata, collected — bounded and tiny), then the row-local
    stratified filter. Expected, not exact, per-stratum counts — at
    corpus scale the binomial deviation is O(1/sqrt(n)) and exactness
    would cost a global sort; pin with a tolerance when testing.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fracs = mix_fractions(counts, target_weights)
    return stratified_sample(df, stratum_col, fracs, key_col, seed=seed, default=0.0)


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    key_col: str,
    seed: str = "cap",
    exact: bool = False,
) -> DataFrame:
    """Bound every stratum to at most ~``cap`` rows (per-domain
    document caps — the standard web-curation guard against one
    registered domain dominating the corpus).

    Unlike :func:`stratified_sample` / :func:`rebalance_to_mix`, no
    per-stratum dict ever reaches the driver, so this survives
    MILLIONS of strata (registered domains at 100 TB): the per-stratum
    counts stay a DataFrame and come back via an equi-join. Strata at
    or under the cap pass untouched; oversized strata keep the
    hash-threshold fraction ``cap/n`` — expected, not exact, counts
    (binomial deviation O(1/sqrt(cap)); same trade, and the same
    nested-by-seed subset property, as every sampler here). Membership
    is still a pure function of (seed, key, stratum count), so the
    kept set is reproducible across runs and engines.

    Plan shape: one map-side-combinable count agg, then corpus ⋈
    counts on the stratum key. With AQE on, a small counts side
    auto-broadcasts (zero corpus shuffle) and a shuffle join's
    hot-domain partitions are skew-split — either way no driver
    collect and no per-stratum window.

    ``exact=True`` trims oversized strata to exactly ``cap`` via a
    salted two-level hash-ordered ``row_number``: a first window over
    ``(stratum, salt)`` spreads each oversized stratum across
    ``n_salts`` tasks and keeps the ``cap`` hash-smallest rows per
    salt, so the final per-stratum window ranks at most ``cap x
    n_salts`` rows instead of the whole stratum — a mega-domain never
    serializes on one task (the round-10 VERDICT hazard). The output
    is identical to the single-window form: the global ``cap``
    hash-smallest rows of a stratum are a subset of the per-salt
    ``cap``-smallest, so the pre-trim never drops a winner. Rows under
    the cap never enter either window; they are routed around by an
    under-cap/overflow split on the joined count.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    # null-safe key: groupBy counts the NULL stratum as a group, but a
    # plain equi-join would drop its rows — NULL-domain rows must
    # travel (capped like any stratum), never silently vanish (the
    # unit_hash NULL-sentinel rule, module docstring)
    joined = df.join(
        counts.withColumnRenamed(stratum_col, "__s"),
        F.col(stratum_col).eqNullSafe(F.col("__s")),
    ).drop("__s")
    if not exact:
        keep = (F.col("__n") <= F.lit(cap)) | (
            unit_hash(key_col, seed) < F.lit(float(cap)) / F.col("__n")
        )
        # the join reorders columns (stratum key first); restore input shape
        return joined.filter(keep).select(*df.columns)
    from pyspark.sql import Window

    under = joined.filter(F.col("__n") <= F.lit(cap)).drop("__n")
    over = joined.filter(F.col("__n") > F.lit(cap)).drop("__n")
    order = [unit_hash(key_col, seed).asc(), F.col(key_col).asc()]
    # level 1: deterministic salt fans the hot stratum over n_salts
    # tasks; keeping the cap hash-smallest per salt is a superset of
    # the stratum's global cap-smallest, so level 2 sees <= cap *
    # n_salts rows per stratum and the result is unchanged. The conf
    # can be non-numeric under managed AQE ('auto') — fall back to 64
    # — and a conf of '1' would silently disable the fan-out the
    # salting exists for — clamp to >= 8 (round-11 advice). The salt
    # count only shapes parallelism, never the kept set.
    try:
        n_salts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "64")
        )
    except (TypeError, ValueError):
        n_salts = 64
    n_salts = max(8, n_salts)
    salt = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + ":salt")), F.lit(n_salts))
    w1 = Window.partitionBy(stratum_col, salt).orderBy(*order)
    pre = (
        over.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= F.lit(cap))
        .drop("__rn1")
    )
    w2 = Window.partitionBy(stratum_col).orderBy(*order)
    trimmed = (
        pre.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= F.lit(cap))
        .drop("__rn")
    )
    return under.unionByName(trimmed).select(*df.columns)


def temperature_weights(
    df: DataFrame,
    stratum_col: str,
    temperature: float,
) -> dict[str, float]:
    """Temperature-scaled mixture weights from the corpus's OWN
    stratum sizes — the standard multinomial data-mixing move
    (p_i ∝ n_i^(1/T), public recipe from the multilingual/multi-domain
    LM literature): T=1 reproduces natural proportions, T->inf tends
    to uniform, T<1 sharpens toward the head. Feed the result straight
    into :func:`rebalance_to_mix` (downsampling) or
    :func:`upsample_to_mix` (repetition).

    One map-side-combinable count per stratum reaches the driver
    (#strata rows — dim-sized by nature); the heavy lifting stays in
    the mix operators.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["s"] is not None and r["n"] > 0
    }
    if not counts:
        return {}
    scaled = {s: n ** (1.0 / temperature) for s, n in counts.items()}
    total = sum(scaled.values())
    return {s: v / total for s, v in scaled.items()}
