from two_tower_models_tpu.training.data import SyntheticRecData, make_synthetic_data
from two_tower_models_tpu.training.state import TrainState, create_train_state
from two_tower_models_tpu.training.step import make_train_step, make_eval_recall_fn

__all__ = [
    "SyntheticRecData",
    "make_synthetic_data",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_recall_fn",
]
