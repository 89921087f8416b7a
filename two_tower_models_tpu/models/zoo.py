"""Model-zoo convenience API.

For users coming from the reference's class-per-variant surface
(TwoTowerBaseRetrieval and its six subclasses), each factory here builds the
matching ``ModelConfig`` and returns a small stateless handle bundling the
config with the functional entry points.  Everything dispatches to the single
traced core in ``models.two_tower`` — the handle holds no arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Sequence

import jax

from two_tower_models_tpu.config import (
    Debias,
    HistoryEncoderConfig,
    LightRankerConfig,
    ModelConfig,
    preset,
)
from two_tower_models_tpu.models import two_tower


@dataclass(frozen=True)
class TwoTowerModel:
    """Stateless handle: config + functional entry points.

    AUTO (None) Pallas-kernel flags resolve against the live backend at
    construction (config.resolve_kernel_flags) — reference-style builders
    get TPU kernels on TPU and the dense path elsewhere, like the trainer.

    Usage:
        model = zoo.two_tower_base_retrieval(num_items=10, ...)
        params = model.init(jax.random.key(0))
        loss, metrics = model.train_forward(params, batch)
        top_items = model.forward(params, corpus, user_id, user_features, user_history)
    """

    cfg: ModelConfig

    def __post_init__(self):
        from two_tower_models_tpu.config import resolve_kernel_flags

        object.__setattr__(self, "cfg", resolve_kernel_flags(self.cfg))

    def init(self, key: jax.Array) -> Dict:
        return two_tower.init_params(key, self.cfg)

    def train_forward(self, params: Dict, batch: two_tower.Batch):
        """Scalar loss + metrics (reference train_forward,
        two_tower_base_retrieval.py:349-394)."""
        return two_tower.train_loss(params, self.cfg, batch)

    def forward(self, params: Dict, corpus, user_id, user_features, user_history):
        """Top num_items corpus indices [B, num_items] (reference forward,
        two_tower_base_retrieval.py:221-249)."""
        return two_tower.retrieve(
            params, self.cfg, corpus, user_id, user_features, user_history
        )

    def compute_user_embedding(self, params, user_id, user_features, user_history):
        return two_tower.compute_user_embedding(
            params, self.cfg, user_id, user_features, user_history
        )

    def compute_item_embeddings(self, params, item_id, item_features):
        return two_tower.compute_item_embeddings(params, self.cfg, item_id, item_features)


def _common(
    num_items: int,
    user_id_hash_size: int,
    user_id_embedding_dim: int,
    user_features_size: int,
    item_id_hash_size: int,
    item_id_embedding_dim: int,
    item_features_size: int,
    user_value_weights: Sequence[float],
) -> dict:
    return dict(
        num_items=num_items,
        user_id_hash_size=user_id_hash_size,
        user_id_embedding_dim=user_id_embedding_dim,
        user_features_size=user_features_size,
        item_id_hash_size=item_id_hash_size,
        item_id_embedding_dim=item_id_embedding_dim,
        item_features_size=item_features_size,
        user_value_weights=tuple(user_value_weights),
    )


def two_tower_base_retrieval(**kwargs) -> TwoTowerModel:
    """Reference: TwoTowerBaseRetrieval (two_tower_base_retrieval.py:25)."""
    return TwoTowerModel(ModelConfig(**kwargs).validate())


def two_tower_with_user_history_encoder(
    *, user_history_seqlen: int, history_encoder: HistoryEncoderConfig | None = None, **kwargs
) -> TwoTowerModel:
    """Reference: TwoTowerWithUserHistoryEncoder
    (two_tower_with_user_history_encoder.py:14); heads=4/layers=3/PE defaults
    match the reference's hardcoded choices (:64-70)."""
    cfg = ModelConfig(
        history_len=user_history_seqlen,
        history_encoder=history_encoder or HistoryEncoderConfig(),
        **kwargs,
    )
    return TwoTowerModel(cfg.validate())


def two_tower_with_position_debiased_weights(*, user_history_seqlen: int, **kwargs):
    """Reference: TwoTowerWithPositionDebiasedWeights
    (two_tower_with_position_debiased_weights.py:17)."""
    cfg = ModelConfig(
        history_len=user_history_seqlen,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.POSITION,
        **kwargs,
    )
    return TwoTowerModel(cfg.validate())


def two_tower_with_user_debiased_weights(*, user_history_seqlen: int, **kwargs):
    """Reference: TwoTowerWithUserDebiasedWeights
    (two_tower_with_user_debiased_weights.py:41)."""
    cfg = ModelConfig(
        history_len=user_history_seqlen,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.USER,
        **kwargs,
    )
    return TwoTowerModel(cfg.validate())


def two_tower_with_debiasing(*, user_history_seqlen: int, **kwargs):
    """Reference: TwoTowerWithDebiasing (two_tower_with_debiasing.py:17)."""
    cfg = ModelConfig(
        history_len=user_history_seqlen,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.BOTH,
        **kwargs,
    )
    return TwoTowerModel(cfg.validate())


def two_tower_plus_light_ranker(
    *,
    user_history_seqlen: int,
    num_mips_items: int,
    num_ranker_user_embeddings: int,
    **kwargs,
):
    """Reference: TwoTowerPlusLightRanker (two_tower_plus_light_ranker.py:13),
    implemented working (the reference variant is unrunnable, SURVEY §2.4)."""
    cfg = ModelConfig(
        history_len=user_history_seqlen,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.BOTH,
        light_ranker=LightRankerConfig(
            num_mips_items=num_mips_items,
            num_ranker_user_embeddings=num_ranker_user_embeddings,
        ),
        **kwargs,
    )
    return TwoTowerModel(cfg.validate())


def two_tower_plus_light_ranker_with_kd(
    *,
    user_history_seqlen: int,
    num_mips_items: int,
    num_ranker_user_embeddings: int,
    **kwargs,
):
    """Reference: TwoTowerPlusLightRankerWithKD
    (two_tower_plus_light_ranker_plus_main_ranker_kd.py:9), implemented to its
    documented intent (the reference body is ``pass``): labels widen to
    [B, 2T]; aux logits distill against the logged soft labels."""
    base = two_tower_plus_light_ranker(
        user_history_seqlen=user_history_seqlen,
        num_mips_items=num_mips_items,
        num_ranker_user_embeddings=num_ranker_user_embeddings,
        **kwargs,
    )
    return TwoTowerModel(replace(base.cfg, kd=True).validate())


def two_tower_with_main_ranker_reward(*, user_history_seqlen: int, **kwargs):
    """Reference: TwoTowerWithMainRankerReward
    (two_tower_base_plus_main_ranker_reward_model.py:12), with the KL
    alignment implemented per its comment spec (:113-122)."""
    cfg = ModelConfig(
        history_len=user_history_seqlen,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.BOTH,
        reward_model=True,
        **kwargs,
    )
    return TwoTowerModel(cfg.validate())


def from_preset(name: str, **overrides) -> TwoTowerModel:
    return TwoTowerModel(preset(name, **overrides))
