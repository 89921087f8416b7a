from two_tower_models_tpu.nn.layers import (
    linear_init,
    linear_apply,
    mlp_init,
    mlp_apply,
    embedding_init,
    embedding_lookup,
)
from two_tower_models_tpu.nn.attention import mha_init, mha_apply

__all__ = [
    "linear_init",
    "linear_apply",
    "mlp_init",
    "mlp_apply",
    "embedding_init",
    "embedding_lookup",
    "mha_init",
    "mha_apply",
]
