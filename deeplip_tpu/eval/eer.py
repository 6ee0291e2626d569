"""Equal error rate computation.

Two implementations:

- :func:`eer_from_scores` — the reference formula, byte-for-byte semantics:
  sklearn ``roc_curve`` then ``brentq(1 - x - interp1d(fpr, tpr)(x))`` and a
  threshold interpolated at the EER (``models/audio_models/utils.py:246-248``).
  This is the number reported for parity.
- :func:`eer_sweep` — an exact O(N log N) pure-NumPy threshold sweep (no
  interpolation): the EER as the crossing point of FAR/FRR step functions.
  Used as a cross-check and where scipy/sklearn are unavailable.
"""

from __future__ import annotations

import numpy as np


def eer_from_scores(y_true, y_score) -> tuple[float, float]:
    """Reference-exact EER: returns ``(eer, threshold)``."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve

    y_true = np.asarray(y_true).reshape(-1)
    y_score = np.asarray(y_score).reshape(-1)
    fpr, tpr, thresholds = roc_curve(y_true, y_score, pos_label=1)
    eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    threshold = float(interp1d(fpr, thresholds)(eer))
    return float(eer), threshold


def eer_sweep(y_true, y_score) -> tuple[float, float]:
    """Exact EER from the FAR/FRR curves, no SciPy dependency.

    Sorts scores descending; at each candidate threshold computes
    FAR = FP/N and FRR = FN/P and returns the point where |FAR - FRR| is
    minimal (averaging FAR and FRR there).
    """
    y_true = np.asarray(y_true).reshape(-1).astype(bool)
    y_score = np.asarray(y_score, dtype=np.float64).reshape(-1)
    order = np.argsort(-y_score)
    scores = y_score[order]
    labels = y_true[order]
    p = labels.sum()
    n = len(labels) - p
    tp = np.cumsum(labels)
    fp = np.cumsum(~labels)
    far = fp / max(n, 1)  # accepting top-k
    frr = 1.0 - tp / max(p, 1)
    # only the LAST index of a tied-score run is a realizable operating
    # point (a threshold accepts all of a tie group or none of it);
    # cutting inside a run would understate the EER on quantized scores
    realizable = np.ones(len(scores), bool)
    realizable[:-1] = np.diff(scores) != 0
    cand = np.nonzero(realizable)[0]
    idx = int(cand[np.argmin(np.abs(far[cand] - frr[cand]))])
    eer = float(0.5 * (far[idx] + frr[idx]))
    return eer, float(scores[idx])
