"""GAN-health metrics.

``RelativisticF1`` mirrors the reference's convergence criterion for the
fine-tuning stage (metrics.py:10-49; F1 pegged near 0.5 means the critic
can no longer tell real from fake, README.md:327).

The reference's ``update`` shifts ``y_pred_real`` in place *first* and then
shifts ``y_pred_fake`` by the mean of the already-shifted reals
(metrics.py:27-28) — asymmetric w.r.t. the RaGAN loss.  That quirk defines
the published convergence behaviour, so it is replicated exactly here (and
documented).  Predictions are treated as logits: positive logit -> "real"
(torchmetrics applies sigmoid then thresholds at 0.5).
"""

from __future__ import annotations

import numpy as np

__all__ = ["RelativisticF1"]


class RelativisticF1:
    """Accumulating F1 over relativistic predictions (host-side scalar state)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._tp = 0
        self._fp = 0
        self._fn = 0

    def update(self, y_pred_real, y_pred_fake, y_real, y_fake) -> None:
        pr = np.asarray(y_pred_real, np.float64).copy()
        pf = np.asarray(y_pred_fake, np.float64).copy()
        # Reference order: real shift first, fake shift uses shifted reals.
        pr -= pf.mean()
        pf -= pr.mean()
        preds = np.concatenate([pr, pf]) > 0.0
        labels = np.concatenate(
            [np.asarray(y_real, np.float64), np.asarray(y_fake, np.float64)]
        ) >= 0.5
        self._tp += int(np.sum(preds & labels))
        self._fp += int(np.sum(preds & ~labels))
        self._fn += int(np.sum(~preds & labels))

    def compute(self) -> tuple[float, float, float]:
        precision = self._tp / (self._tp + self._fp) if self._tp + self._fp else 0.0
        recall = self._tp / (self._tp + self._fn) if self._tp + self._fn else 0.0
        if precision + recall == 0:
            return 0.0, precision, recall
        return 2 * precision * recall / (precision + recall), precision, recall
