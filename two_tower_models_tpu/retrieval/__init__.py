from two_tower_models_tpu.retrieval.mips import (
    mips_init,
    mips_topk,
    refresh_corpus,
    sharded_mips_topk,
)

__all__ = ["mips_init", "mips_topk", "refresh_corpus", "sharded_mips_topk"]
