from two_tower_models_tpu.models.two_tower import (
    init_params,
    compute_user_embedding,
    compute_item_embeddings,
    train_loss,
    retrieve,
)
from two_tower_models_tpu.models.history_encoder import (
    history_encoder_init,
    history_encoder_apply,
    sinusoidal_positional_encoding,
)
from two_tower_models_tpu.models import zoo

__all__ = [
    "init_params",
    "compute_user_embedding",
    "compute_item_embeddings",
    "train_loss",
    "retrieve",
    "history_encoder_init",
    "history_encoder_apply",
    "sinusoidal_positional_encoding",
    "zoo",
]
