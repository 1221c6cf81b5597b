"""TWCNB — Transformed Weight-Normalized Complement Naive Bayes
(Rennie et al. 2003; SURVEY §2C C1; reference
``myMahoutApp/.../TWCNB.scala:28-148``).

The reference's plan needs two transposes, an allreduce to strip empty
rows, a re-parallelize, and two broadcast round-trips (SURVEY §3 entry
point 2) because Samsara's per-class aggregation is the 'transpose trick'.
Spark-first, the whole train collapses to ONE shuffle:

1. ``groupBy(label).agg(elementwise_sum)`` over the (docs × terms) TF-IDF
   DRM whose row keys are class labels — the only row-scaled stage.
2. Model assembly on the C×T per-class matrix (C = #classes, tiny) in
   numpy on the driver: complement counts, Laplace smoothing, log, weight
   normalization. The model is declared-small (terms × classes), exactly
   like the reference, which holds it in-core at serving time
   (``NaiveBayesServlet.scala:42``).

Scoring (A10 shape) is a broadcast matmul: docs × model, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mahout_samsara_book_spark.drm.drm import Drm


@dataclass
class TwcnbModel:
    """Complement-NB model: unnormalized log-ratios θ and TWCNB's
    weight-normalized form, both (terms × classes), + class-label order.

    ``theta`` equals the NEGATION of MLlib's complement-NB ``theta``
    exactly (MLlib stores the negated ratios and skips weight
    normalization) — the dual-implementation oracle relation used by the
    tests, mirroring TWCNBSuite.scala:139's negated-score comparison.
    """

    labels: np.ndarray  # (C,) int64 class keys, ascending
    weights: np.ndarray  # (T, C) float64 — weight-normalized
    theta: np.ndarray  # (T, C) float64 — unnormalized log ratios

    @property
    def n_labels(self) -> int:
        return len(self.labels)

    @property
    def is_complementary(self) -> bool:  # D6 model metadata parity
        return True


def twcnb_train(drm_labeled: Drm, alpha: float = 1.0) -> TwcnbModel:
    """Train on a DRM whose row keys are class labels (the caller re-keys
    docs to labels, as in ``TWCNBSuite.scala:66-74``).

    Per-class complement weights (book Alg 8.2 / TWCNB.scala steps):
      comp[c][t] = Σ_{docs ∉ c} tfidf[t]           (complement counts,
                                                     TWCNB.scala:109-114)
      θ[c][t]    = log((comp[c][t] + α) / (Σ_t comp[c][t] + α·T))
                                                    (smooth + log,
                                                     TWCNB.scala:117-129)
      w[c][t]    = θ[c][t] / Σ_t |θ[c][t]|          (weight normalization,
                                                     TWCNB.scala:134-147)
    """
    agg = drm_labeled.aggregate_rows_by_key()
    labels, per_class = agg.collect_keys_matrix()  # (C,), (C, T)
    order = np.argsort(labels)
    labels, per_class = labels[order], per_class[order]
    n_terms = per_class.shape[1]

    term_totals = per_class.sum(axis=0)  # Σ over all classes per term
    comp = term_totals[None, :] - per_class  # (C, T)
    denom = comp.sum(axis=1, keepdims=True) + alpha * n_terms
    theta = np.log((comp + alpha) / denom)
    weights = theta / np.abs(theta).sum(axis=1, keepdims=True)
    return TwcnbModel(
        labels=labels, weights=weights.T.copy(), theta=theta.T.copy()
    )  # both (T, C)


def twcnb_score(drm_docs: Drm, model: TwcnbModel, normalized: bool = True) -> Drm:
    """Score docs × classes = TFIDF %*% W (A10 — TWCNBSuite.scala:115):
    broadcast matmul, no shuffle. LOWER is better (complement scores);
    negate for argmax semantics."""
    return drm_docs.mmul(model.weights if normalized else model.theta)


def twcnb_predict(drm_docs: Drm, model: TwcnbModel) -> "DataFrame":  # noqa: F821
    """(row_id, label) via per-row arg-MIN of complement scores (D3 argmax
    on negated scores), as a SQL expression over the score DRM."""
    from pyspark.sql import functions as F

    scores = twcnb_score(drm_docs, model)
    neg = scores.map_elements(lambda x: -x)
    best = F.array_position(
        F.col("features"), F.array_max(F.col("features"))
    ) - 1
    labels_arr = F.array(*[F.lit(int(l)) for l in model.labels])
    return neg.df.select(
        "row_id",
        F.element_at(labels_arr, (best + 1).cast("int")).alias("label"),
    )
