from two_tower_models_tpu.utils.logging import JsonlLogger

__all__ = ["JsonlLogger"]
