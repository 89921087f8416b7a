from two_tower_models_tpu.retrieval.mips import (
    chunked_mips_topk,
    mips_init,
    mips_topk,
    refresh_corpus,
    sharded_mips_topk,
)

__all__ = [
    "chunked_mips_topk",
    "mips_init",
    "mips_topk",
    "refresh_corpus",
    "sharded_mips_topk",
]
