from .warps import (
    apply_gp_warp,
    apply_gp_warp_multimodal,
    apply_linear_warp,
    apply_polar_warp,
)
from .simulated import (
    generate_oned_data_affine_warp,
    generate_oned_data_gp_warp,
    generate_twod_data,
    generate_twod_data_partial_overlap,
)
