from .kernels import (
    rbf_kernel,
    matern12_kernel,
    matern32_kernel,
    rbf_kernel_numpy,
    get_kernel,
    pairwise_sqdist,
)
from .linalg import (
    add_jitter,
    safe_cholesky,
    cholesky_solve,
    tri_solve,
    kl_mvn_chol,
    kl_whitened,
    chol_logdet,
)
