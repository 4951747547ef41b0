"""Test harness config: force CPU with 8 virtual devices.

The image's sitecustomize registers the axon TPU plugin and forces
``jax_platforms=axon,cpu``; tests must run on the host CPU with a virtual
8-device mesh (SURVEY.md §4 tier-4), so we override before any backend
initializes. This must happen before the first ``jax.devices()`` call.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_two_view_data(
    n_per_view=30, n_outputs=3, n_views=2, seed=0, warp_sigma=0.1, dtype=np.float32
):
    """Tiny two-view dataset: second view is a jittered copy of the first."""
    rng = np.random.default_rng(seed)
    X1 = rng.uniform(0, 10, (n_per_view, 2)).astype(dtype)
    Y1 = np.stack(
        [np.sin(X1[:, 0] * (j + 1) / 3.0) + np.cos(X1[:, 1]) for j in range(n_outputs)],
        axis=1,
    ).astype(dtype)
    Xs, Ys = [X1], [Y1]
    for _ in range(n_views - 1):
        Xs.append(X1 + warp_sigma * rng.standard_normal(X1.shape).astype(dtype))
        Ys.append(Y1)
    X = np.concatenate(Xs, 0)
    Y = np.concatenate(Ys, 0)
    return {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": [n_per_view] * n_views,
        }
    }


@pytest.fixture
def two_view_data():
    return make_two_view_data()
