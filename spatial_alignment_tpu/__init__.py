"""spatial_alignment_tpu — TPU-native GPSA (Gaussian Process Spatial Alignment).

A ground-up JAX/XLA rebuild of the capabilities of
``andrewcharlesjones/spatial-alignment`` (reference mounted at
/root/reference): multi-view, multi-modal alignment of spatially-resolved
data via a two-layer deep GP (per-view warp GP -> shared data GP) trained by
stochastic variational inference.

Public facade parity: /root/reference/gpsa/__init__.py:1-10.
"""

from .models.vgpsa import VariationalGPSA, GPSA, make_key, default_prng_impl
from .models.mle import WarpGPMLE
from .models.spec import ModelSpec, ModalitySpec, build_spec, pack_batch
from .models import core
from .ops.kernels import (
    rbf_kernel,
    matern12_kernel,
    matern32_kernel,
    rbf_kernel_numpy,
)
from .utils.convergence import ConvergenceChecker, LossNotDecreasingChecker
from .utils.preprocess import (
    polar_warp,
    get_st_coordinates,
    compute_distance,
    make_pinwheel,
    compute_size_factors,
    poisson_deviance,
    deviance_feature_selection,
    deviance_residuals,
    pearson_residuals,
)

__version__ = "0.2.0"

__all__ = [
    "VariationalGPSA",
    "GPSA",
    "WarpGPMLE",
    "ModelSpec",
    "ModalitySpec",
    "build_spec",
    "pack_batch",
    "core",
    "rbf_kernel",
    "matern12_kernel",
    "matern32_kernel",
    "rbf_kernel_numpy",
    "ConvergenceChecker",
    "LossNotDecreasingChecker",
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
