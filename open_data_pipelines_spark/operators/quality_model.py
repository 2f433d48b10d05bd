"""Model-based quality filtering (engine extension; the learned
counterpart of the rule-based ``quality_score`` heuristics — the
CCNet / fastText-classifier stage of modern LLM data pipelines, where
a cheap linear model trained on "known good vs known junk" seeds
scores the whole corpus).

Everything is Spark-native and scale-shaped:

- **Features** are pure codegen Column expressions (length, token
  shape, punctuation/digit/upper ratios, stopword hit rate,
  whitespace-run signal) — no Python in the row path.
- **Training** is full-batch logistic regression by gradient descent
  where each iteration is ONE global aggregation (map-side-combined
  partial sums of per-feature gradients — a scalar-row result), with
  the current weights inlined as literals. The feature frame is
  persisted once; iterations stream over the cache. No MLlib
  dependency, no driver-side data.
- **Scoring** inlines the learned weights into a sigmoid expression —
  zero joins, zero shuffles, prunes to the text column.

Feature standardization (mean/std from one aggregation) is folded
into the weights after training, so scoring needs no stats table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import STOPWORDS, token_count_ws

FEATURE_NAMES = (
    "log_len",
    "mean_word_len",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_rate",
    "space_anomaly",
)


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def quality_features(text: Column | str) -> dict[str, Column]:
    """The per-doc feature map — each value a single codegen
    expression over the text column."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    words = list(STOPWORDS["en"])
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return {
        "log_len": F.log1p(n_chars.cast("double")),
        "mean_word_len": _ratio(n_chars, n_tokens),
        "punct_ratio": _ratio(
            F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")), n_chars
        ),
        "digit_ratio": _ratio(F.length(F.regexp_replace(c, r"[^0-9]", "")), n_chars),
        "upper_ratio": _ratio(F.length(F.regexp_replace(c, r"[^A-Z]", "")), n_chars),
        "stopword_rate": _ratio(stop_hits, n_tokens),
        # runs of 3+ spaces / weird spacing — format-junk signal
        "space_anomaly": _ratio(
            F.length(F.regexp_replace(c, r"[^\s]", ""))
            - n_tokens.cast("int")
            + F.lit(1),
            n_chars,
        ),
    }


def with_quality_features(df: DataFrame, text_col: str) -> DataFrame:
    feats = quality_features(text_col)
    return df.select("*", *[expr.alias(name) for name, expr in feats.items()])


@dataclass(frozen=True)
class QualityModel:
    """Logistic model over FEATURE_NAMES, standardization folded in:
    score = sigmoid(bias + sum_j weight_j * feature_j)."""

    weights: tuple[float, ...]
    bias: float
    train_loss: tuple[float, ...]  # per-iteration log-loss trace

    def score_expr(self, text: Column | str) -> Column:
        feats = quality_features(text)
        z = F.lit(self.bias)
        for name, w in zip(FEATURE_NAMES, self.weights):
            z = z + F.lit(w) * feats[name]
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def to_dict(self) -> dict:
        """JSON-serializable form — ship the model to a scheduler /
        streaming job without pickling."""
        return {
            "features": list(FEATURE_NAMES),
            "weights": list(self.weights),
            "bias": self.bias,
            "train_loss": list(self.train_loss),
        }

    @staticmethod
    def from_dict(d: dict) -> "QualityModel":
        if tuple(d.get("features", ())) != FEATURE_NAMES:
            raise ValueError(
                f"model features {d.get('features')} do not match this "
                f"engine version's {list(FEATURE_NAMES)}"
            )
        return QualityModel(
            tuple(float(w) for w in d["weights"]),
            float(d["bias"]),
            tuple(float(x) for x in d.get("train_loss", ())),
        )


def fit_quality_model(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_iter: int = 60,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> QualityModel:
    """Full-batch logistic regression: ``label_col`` is 1 for known
    good seeds, 0 for known junk. Each iteration is one tiny global
    aggregation (7 gradient sums + loss + count) over the persisted,
    standardized feature frame; weights travel as inlined literals.

    Driver state is O(features) — nothing row-shaped ever collects.
    """
    k = len(FEATURE_NAMES)
    feats = quality_features(text_col)
    raw = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[expr.alias(name) for name, expr in feats.items()],
    )
    # standardization stats: one aggregation
    stats = raw.agg(
        *[F.avg(n).alias(f"m_{n}") for n in FEATURE_NAMES],
        *[F.stddev_pop(n).alias(f"s_{n}") for n in FEATURE_NAMES],
    ).first()
    mean = [float(stats[f"m_{n}"] or 0.0) for n in FEATURE_NAMES]
    std = [max(float(stats[f"s_{n}"] or 0.0), 1e-9) for n in FEATURE_NAMES]
    z = raw.select(
        "__y",
        *[
            ((F.col(n) - F.lit(mean[j])) / F.lit(std[j])).alias(n)
            for j, n in enumerate(FEATURE_NAMES)
        ],
    ).persist()
    try:
        n_rows = z.count()  # materializes the cache
        if n_rows == 0:
            raise ValueError("empty training frame")
        w = [0.0] * k
        b = 0.0
        losses: list[float] = []
        for _ in range(n_iter):
            margin = F.lit(b)
            for j, name in enumerate(FEATURE_NAMES):
                margin = margin + F.lit(w[j]) * F.col(name)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            err = p - F.col("__y")
            row = z.agg(
                *[F.sum(err * F.col(n)).alias(f"g_{n}") for n in FEATURE_NAMES],
                F.sum(err).alias("g_b"),
                # clamped log-loss, numerically safe
                F.avg(
                    -F.col("__y") * F.log(F.greatest(p, F.lit(1e-12)))
                    - (1 - F.col("__y"))
                    * F.log(F.greatest(1 - p, F.lit(1e-12)))
                ).alias("loss"),
            ).first()
            losses.append(float(row["loss"]))
            for j, name in enumerate(FEATURE_NAMES):
                w[j] -= lr * (float(row[f"g_{name}"]) / n_rows + l2 * w[j])
            b -= lr * float(row["g_b"]) / n_rows
    finally:
        z.unpersist()
    # fold standardization into raw-feature weights:
    # w·(x-m)/s + b  ==  (w/s)·x + (b - sum w_j m_j / s_j)
    folded = [w[j] / std[j] for j in range(k)]
    bias = b - sum(w[j] * mean[j] / std[j] for j in range(k))
    return QualityModel(tuple(folded), bias, tuple(losses))


def score_quality(df: DataFrame, model: QualityModel, text_col: str) -> DataFrame:
    """Append ``model_quality`` in [0,1] — a single codegen projection."""
    return df.withColumn("model_quality", model.score_expr(text_col))


def quality_model_filter(
    df: DataFrame, model: QualityModel, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Keep rows the model scores at or above ``threshold`` (schema
    unchanged) — composes into prepare_corpus-style funnels next to
    the rule-based quality filter."""
    return df.filter(model.score_expr(text_col) >= F.lit(threshold))
