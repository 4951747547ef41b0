"""Convergence checkers (host-side, numpy).

Parity: /root/reference/gpsa/util/util.py:112-151 (ConvergenceChecker) and
:257-278 (LossNotDecreasingChecker). Both are exported API in the reference
(gpsa/__init__.py:9) and operate on host loss traces, so they stay numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ConvergenceChecker", "LossNotDecreasingChecker"]


class ConvergenceChecker:
    """Cubic-polynomial smoothing (via SVD basis) + relative-change tolerance."""

    def __init__(self, span, dtp="float64"):
        self.span = span
        x = np.arange(span, dtype=dtp)
        x -= x.mean()
        X = np.column_stack((np.ones(shape=x.shape), x, x**2, x**3))
        self.U = np.linalg.svd(X, full_matrices=False)[0]

    def smooth(self, y):
        return self.U @ (self.U.T @ y)

    def subset(self, y, idx=-1):
        span = self.U.shape[0]
        lo = idx - span + 1
        if idx == -1:
            return y[lo:]
        return y[lo : (idx + 1)]

    def relative_change(self, y, idx=-1, smooth=True):
        y = self.subset(y, idx=idx)
        if smooth:
            y = self.smooth(y)
        prev = y[-2]
        return (y[-1] - prev) / (0.1 + abs(prev))

    def converged(self, y, tol=1e-4, **kwargs):
        return abs(self.relative_change(y, **kwargs)) < tol

    def relative_change_all(self, y, smooth=True):
        n = len(y)
        span = self.U.shape[0]
        cc = np.tile([np.nan], n)
        for i in range(span, n):
            cc[i] = self.relative_change(y, idx=i, smooth=smooth)
        return cc

    def converged_all(self, y, tol=1e-4, smooth=True):
        cc = self.relative_change_all(y, smooth=smooth)
        return np.abs(cc) < tol


class LossNotDecreasingChecker:
    """Windowed mean-decrease early stop; callable so it plugs straight into
    ``VariationalGPSA.fit(convergence_checker=...)``."""

    def __init__(self, max_epochs, atol=1e-2, window_size=10):
        self.max_epochs = max_epochs
        self.atol = atol
        self.window_size = window_size
        self.decrease_in_loss = np.zeros(max_epochs)
        self.average_decrease_in_loss = np.zeros(max_epochs)

    def check_loss(self, iternum, loss_trace):
        if iternum >= 1:
            self.decrease_in_loss[iternum] = (
                loss_trace[iternum - 1] - loss_trace[iternum]
            )
            if iternum >= self.window_size:
                self.average_decrease_in_loss[iternum] = np.mean(
                    self.decrease_in_loss[iternum - self.window_size + 1 : iternum]
                )
                return bool(self.average_decrease_in_loss[iternum] < self.atol)
        return False

    __call__ = check_loss
