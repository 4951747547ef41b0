"""Count-data preprocessing and small spatial utilities (host-side numpy).

Parity: /root/reference/gpsa/util/util.py:69-109,155-254. These run once on
ingest (size factors, deviance/Pearson residuals, feature selection), so they
stay numpy/pandas — no value in tracing them.
"""

from __future__ import annotations

import numpy as np
import numpy.random as npr
from scipy.special import xlogy

__all__ = [
    "polar_warp",
    "get_st_coordinates",
    "compute_distance",
    "make_pinwheel",
    "compute_size_factors",
    "poisson_deviance",
    "deviance_feature_selection",
    "deviance_residuals",
    "pearson_residuals",
]


def polar_warp(X, r, theta):
    """x + r (cos t, sin t) — parity: util/util.py:69-70."""
    return np.array([X[:, 0] + r * np.cos(theta), X[:, 1] + r * np.sin(theta)]).T


def get_st_coordinates(df):
    """Extract spatial coords from ST data with 'AxB'-format index
    (util/util.py:73-84)."""
    coor = []
    for spot in df.index:
        coordinates = spot.split("x")
        coordinates = [float(i) for i in coordinates]
        coor.append(coordinates)
    return np.array(coor)


def compute_distance(X1, X2):
    """Mean Euclidean row distance (util/util.py:87-88)."""
    return np.mean(np.sqrt(np.sum((X1 - X2) ** 2, axis=1)))


def make_pinwheel(
    radial_std, tangential_std, num_classes, num_per_class, rate, rs=None
):
    """Pinwheel synthetic dataset (util/util.py:91-109; based on code by
    Ryan P. Adams)."""
    if rs is None:
        rs = npr.RandomState(0)
    rads = np.linspace(0, 2 * np.pi, num_classes, endpoint=False)
    features = rs.randn(num_classes * num_per_class, 2) * np.array(
        [radial_std, tangential_std]
    )
    features[:, 0] += 1
    labels = np.repeat(np.arange(num_classes), num_per_class)
    angles = rads[labels] + rate * np.exp(features[:, 0])
    rotations = np.stack(
        [np.cos(angles), -np.sin(angles), np.sin(angles), np.cos(angles)]
    )
    rotations = np.reshape(rotations.T, (-1, 2, 2))
    return np.einsum("ti,tij->tj", features, rotations)


def compute_size_factors(m):
    """Poisson size factors with unit geometric mean (util/util.py:155-164).
    ``m`` has samples in columns (pandas DataFrame or ndarray)."""
    vals = m.values if hasattr(m, "values") else np.asarray(m)
    sz = np.sum(vals, axis=0)
    lsz = np.log(sz)
    return np.exp(lsz - np.mean(lsz))


def poisson_deviance(X, sz):
    """Per-feature Poisson deviance (util/util.py:167-178). X: features in
    rows, samples in columns (DataFrame)."""
    LP = X.values / sz if hasattr(X, "values") else np.asarray(X) / sz
    LP[LP > 0] = np.log(LP[LP > 0])
    X = X.T
    ll_sat = np.sum(np.multiply(X, LP.T), axis=0)
    feature_sums = np.sum(X, axis=0)
    ll_null = feature_sums * np.log(feature_sums / np.sum(sz))
    return 2 * (ll_sat - ll_null)


def deviance_feature_selection(X):
    """Rank features by Poisson deviance (util/util.py:181-197)."""
    X = X[np.sum(X, axis=1) > 0]
    sz = compute_size_factors(X)
    devs = poisson_deviance(X, sz)
    gene_names = X.index.values
    devs_values = devs.values if hasattr(devs, "values") else np.asarray(devs)
    assert gene_names.shape[0] == devs_values.shape[0]
    return devs_values, gene_names


def deviance_residuals(x, theta, mu=None):
    """Deviance residuals for NB (finite theta) or Poisson (theta=inf) model
    (util/util.py:200-235)."""
    if mu is None:
        counts_sum0 = np.sum(x, axis=0, keepdims=True)
        counts_sum1 = np.sum(x, axis=1, keepdims=True)
        counts_sum = np.sum(x)
        mu = counts_sum1 @ counts_sum0 / counts_sum

    def remove_negatives(sqrt_term):
        negatives_idx = sqrt_term < 0
        if np.any(negatives_idx):
            n_negatives = np.sum(negatives_idx)
            print(
                "Setting %u negative sqrt term values to 0 (%f%%)"
                % (n_negatives, n_negatives / np.prod(sqrt_term.shape))
            )
            sqrt_term[negatives_idx] = 0

    if np.isinf(theta):  # Poisson
        x_minus_mu = x - mu
        sqrt_term = 2 * (xlogy(x, x / mu) - x_minus_mu)
        remove_negatives(sqrt_term)
        dev = np.sign(x_minus_mu) * np.sqrt(sqrt_term)
    else:  # Negative binomial
        x_plus_theta = x + theta
        sqrt_term = 2 * (
            xlogy(x, x / mu) - (x_plus_theta) * np.log(x_plus_theta / (mu + theta))
        )
        remove_negatives(sqrt_term)
        dev = np.sign(x - mu) * np.sqrt(sqrt_term)
    return dev


def pearson_residuals(counts, theta, clipping=True):
    """Analytic Pearson residuals for the NB model, clipped to ±sqrt(N)
    (util/util.py:238-254)."""
    counts_sum0 = np.sum(counts, axis=0, keepdims=True)
    counts_sum1 = np.sum(counts, axis=1, keepdims=True)
    counts_sum = np.sum(counts)
    mu = counts_sum1 @ counts_sum0 / counts_sum
    z = (counts - mu) / np.sqrt(mu + mu**2 / theta)
    if clipping:
        n = counts.shape[0]
        z[z > np.sqrt(n)] = np.sqrt(n)
        z[z < -np.sqrt(n)] = -np.sqrt(n)
    return z
