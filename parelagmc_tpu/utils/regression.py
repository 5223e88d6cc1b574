"""Weighted log-log rate regression used by the MC/MLMC managers.

Estimates the exponent `a` in y ~ C * x^(-a) from per-level data, weighting
the residuals like the reference's expWRegression
(/root/reference/src/Utilities.cpp:257-283): a weighted least-squares fit of
log|y| against log(x) with weights proportional to sqrt(x) (finer levels,
which have more dofs, count more), optionally skipping the last (coarsest)
points.

Returns the *decay rate* a (positive when y decreases as x grows).
"""

from __future__ import annotations

import numpy as np


def exp_weighted_regression(
    y: np.ndarray, x: np.ndarray, skip_n_last: int = 0
) -> float:
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = y.shape[0] - skip_n_last
    if n < 2:
        return 0.0
    ly = np.log(np.abs(y[:n]) + 1e-300)
    lx = np.log(x[:n])
    w = np.sqrt(x[:n])
    # Weighted least squares for ly = b0 + b1 * lx.
    sw = w.sum()
    mx = (w * lx).sum() / sw
    my = (w * ly).sum() / sw
    vx = (w * (lx - mx) ** 2).sum()
    if vx <= 0.0:
        return 0.0
    b1 = (w * (lx - mx) * (ly - my)).sum() / vx
    return float(-b1)
