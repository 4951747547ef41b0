from .spec import ModelSpec, ModalitySpec, build_spec, pack_batch, create_view_idx_dict
from .params import init_params, merge_hyperparams
from .vgpsa import VariationalGPSA, GPSA
from .mle import WarpGPMLE
from . import core
