from .sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_shardings,
    param_shardings,
    distribute,
)
from .shardmap import make_shardmap_neg_elbo, make_shardmap_train_step
