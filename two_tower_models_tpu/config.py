"""Typed configuration tree for the TPU-native two-tower framework.

The reference (gauravchak/two_tower_models) expresses its model zoo as a
single-inheritance chain of seven classes rooted at ``TwoTowerBaseRetrieval``
(two_tower_base_retrieval.py:25), with hyperparameters hardcoded in
constructors (hidden width 256 at two_tower_base_retrieval.py:76-80, attention
heads/layers at two_tower_with_user_history_encoder.py:64-70, position table
size 100 at two_tower_with_position_debiased_weights.py:72-74).

Here every variant is a point in one explicit config space: a frozen dataclass
selects which modules and loss terms are active.  This keeps the training step
a single pure function of ``(params, batch, config)`` that XLA traces once —
no Python polymorphism inside ``jit``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp


class Debias:
    """Which example-weight debiasing head is active.

    Mirrors the reference's ``debias_net_user_value`` hook family:
      NONE      -> identity hook (two_tower_base_retrieval.py:251-277)
      POSITION  -> position table  (two_tower_with_position_debiased_weights.py:76-113)
      USER      -> linear-on-user-embedding (two_tower_with_user_debiased_weights.py:100-135)
      BOTH      -> combined (two_tower_with_debiasing.py:77-129)
    """

    NONE = "none"
    POSITION = "position"
    USER = "user"
    BOTH = "both"

    ALL = (NONE, POSITION, USER, BOTH)


@dataclass(frozen=True)
class HistoryEncoderConfig:
    """User-history encoder (reference: user_history_encoder.py:11-124)."""

    num_heads: int = 4
    num_layers: int = 3
    use_positional_encoding: bool = True
    # Blockwise Pallas attention (ops.pallas.history_attention): O(H) memory
    # in BOTH directions (flash forward + two-pass flash backward from saved
    # lse; verified at H=4096: 0 MiB device temp vs 512 MiB for the dense
    # backward), the seam for ring/context parallelism.  A MEMORY kernel,
    # not a speed kernel: measured slower than XLA's dense attention up
    # through H=512 (hd=16 minor-dim shapes are MXU-hostile either way);
    # reach for it when the [H, H] probability tensors don't fit — under
    # grad that crossover is where N*H*H*4 bytes approaches HBM (e.g.
    # H >= ~4k at N=4k heads).  Off by default.
    blockwise_kernel: bool = False
    # Fully-fused Pallas layer (ops.pallas.fused_mha): whole QKV+MHA+out-proj
    # per batch tile in VMEM.  ~3x over XLA's head-split lowering at
    # H=32, D=64, B=16k (BASELINE.md).  Runs interpreted (slow) off-TPU, so
    # off by default; the bench enables it.
    fused_kernel: bool = False
    # Whole-encoder Pallas kernel (ops.pallas.fused_encoder): PE + all
    # attention layers + mean-pool in ONE kernel; the batch tile never
    # leaves VMEM between layers and the final layer computes only query
    # row 0 (the only row the encoder's contract consumes).  Supersedes
    # fused_kernel when set.
    # None = AUTO: enabled iff running on TPU (resolve_kernel_flags — entry
    # points resolve it; an unresolved None reads as False, the CPU path).
    # Round-5 finding: with these flags plainly False, the training loop ran
    # the dense XLA encoder/loss at ~31 ms/step while bench's explicitly
    #-enabled step ran 6.6 ms — auto-resolution closes that 4.7x by default.
    fused_encoder: bool | None = None


@dataclass(frozen=True)
class LightRankerConfig:
    """Two-stage retrieval: light ranker over MIPS candidates.

    Reference: two_tower_plus_light_ranker.py:13-340.
    ``num_mips_items`` (NI) candidates are retrieved and reranked down to
    ``ModelConfig.num_items`` by a pointwise multi-task head.
    ``num_ranker_user_embeddings`` (NU) parallel user embeddings feed
    target-aware attention.
    """

    num_mips_items: int = 50
    num_ranker_user_embeddings: int = 4


@dataclass(frozen=True)
class ModelConfig:
    """Full model-space configuration.

    Dimension glossary (kept identical to the reference's comments):
      B batch, T #tasks, DU user-id embed dim, DI item-id embed dim,
      IU/II user/item dense-feature size, H history length, C corpus size,
      NI retrieved items, NU #ranker user embeddings.
    """

    # --- embedding tables ---
    user_id_hash_size: int = 1024
    user_id_embedding_dim: int = 32  # DU
    item_id_hash_size: int = 1024
    item_id_embedding_dim: int = 32  # DI (== tower output dim == MIPS dim)

    # --- dense features ---
    user_features_size: int = 8  # IU
    item_features_size: int = 8  # II
    feature_hidden_dim: int = 256  # hidden width of the feature MLPs

    # --- labels / value model ---
    user_value_weights: Tuple[float, ...] = (1.0,)  # [T]

    # --- retrieval ---
    num_items: int = 10  # items returned per query at inference
    # Serving-path MIPS: lax.approx_max_k rides the TPU's PartialReduce unit
    # (~47x lower latency than exact lax.top_k at 1M x 64 / k=100, measured
    # recall@100 = 0.974 at the default target — BASELINE.md).  Exact top-k
    # when False (eval/parity; ~330 ms per 1024-query batch at 1M).
    approx_mips: bool = False
    mips_recall_target: float = 0.95

    # --- user-ID memorization arm ---
    # Named extension point mirroring the reference's get_user_embedding hook
    # (two_tower_base_retrieval.py:112-127): "table" is the id-table lookup;
    # register alternatives with models.two_tower.register_user_embedding_arm
    # (e.g. an external user-representation module).
    user_embedding_arm: str = "table"

    # --- user history ---
    history_len: int = 10  # H
    history_encoder: Optional[HistoryEncoderConfig] = None

    # --- debiasing ---
    debias: str = Debias.NONE
    position_table_size: int = 100
    # clamp floors, matching the reference's scattered epsilons
    position_debias_min: float = 1e-3
    user_debias_min: float = 1e-1
    combined_debias_min: float = 1e-3
    nuv_min: float = 1e-6
    # The reference's debias aux MSEs are SUM-reduced over the batch
    # (two_tower_with_position_debiased_weights.py:101-103), so at production
    # batch sizes they swamp the mean-reduced retrieval CE (measured: recall
    # collapses to 0 at B=4096 — BASELINE.md).  1.0 keeps reference
    # semantics; scale by ~1/B for large-batch training.
    debias_aux_weight: float = 1.0

    # --- negative sampling beyond the in-batch pool ---
    # The reference deliberately ships PLAIN in-batch softmax and points at
    # the literature for the rest (two_tower_base_retrieval.py:289-295 names
    # both corrections and cites the Mixed Negative Sampling guidance).
    # These implement that pointer, off by default (parity semantics):
    #   mixed_negatives  — append B' uniformly-sampled catalog items to every
    #     batch's negative pool (Yang et al. 2020, MNS): in-batch negatives
    #     follow the ITEM POPULARITY distribution, so rarely-engaged items
    #     are almost never contrasted against; uniform extras restore tail
    #     coverage.  Sampled inside the jitted step from state.rng.
    #   logq_correction  — subtract each candidate's log sampling probability
    #     from its logit before the softmax (Yi et al. 2019 sampled-softmax
    #     correction; positives included): in-batch columns use the data's
    #     item log-frequency (SyntheticRecData.catalog_logq), uniform extras
    #     use log(1/C).  Without it, popular items are over-penalized as
    #     negatives and the model systematically under-scores them.
    mixed_negatives: int = 0
    logq_correction: bool = False

    # --- light ranker / KD / reward model ---
    light_ranker: Optional[LightRankerConfig] = None
    # knowledge distillation: light ranker emits T extra aux logits trained
    # against logged soft labels (labels widen to [B, 2T]);
    # reference intent: two_tower_plus_light_ranker_plus_main_ranker_kd.py:10-19
    kd: bool = False
    kd_loss_weight: float = 1.0
    # ranker-as-reward-model alignment KL
    # reference intent: two_tower_base_plus_main_ranker_reward_model.py:113-122
    reward_model: bool = False
    reward_model_loss_weight: float = 1.0

    # --- numerics ---
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # set "bfloat16" for TPU MXU throughput
    # Fused Pallas softmax-CE kernel: the [B, B] logit matrix never
    # materializes in HBM (ops.pallas.fused_softmax).  Numerically equivalent
    # (parity-tested); pays off for global batches >= ~2k rows.
    # None = AUTO: enabled iff running on TPU (resolve_kernel_flags — entry
    # points resolve it; an unresolved None reads as False, the CPU path).
    fused_loss: bool | None = None

    @property
    def num_tasks(self) -> int:
        return len(self.user_value_weights)

    @property
    def user_tower_input_dim(self) -> int:
        base = 2 * self.user_id_embedding_dim
        if self.history_encoder is not None:
            base += 2 * self.item_id_embedding_dim
        return base

    @property
    def pdtype(self):
        return jnp.dtype(self.param_dtype)

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    def validate(self) -> "ModelConfig":
        if self.debias not in Debias.ALL:
            raise ValueError(f"debias must be one of {Debias.ALL}, got {self.debias!r}")
        if self.debias != Debias.NONE and self.history_encoder is None:
            # The reference's debias variants all sit on top of the history
            # tower (two_tower_with_position_debiased_weights.py:17); we keep
            # that composition legal but don't require it.  No error.
            pass
        if self.kd and self.light_ranker is None:
            raise ValueError("kd=True requires a light_ranker config")
        if self.light_ranker is not None and self.history_encoder is None:
            raise ValueError(
                "light_ranker requires history_encoder (ranker user tower input "
                "includes the history summary, two_tower_plus_light_ranker.py:71-82)"
            )
        if self.history_encoder is not None:
            if self.item_id_embedding_dim % self.history_encoder.num_heads != 0:
                raise ValueError("item_id_embedding_dim must divide evenly by num_heads")
        if (
            self.light_ranker is not None
            and self.light_ranker.num_mips_items < self.num_items
        ):
            raise ValueError(
                f"light_ranker.num_mips_items ({self.light_ranker.num_mips_items}) "
                f"must be >= num_items ({self.num_items}): the two-stage path "
                "retrieves NI candidates then reranks DOWN to num_items "
                "(two_tower_plus_light_ranker.py:194-208)"
            )
        return self


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.

    axes: ``data`` (batch sharding / DP) and ``model`` (embedding-table row
    sharding; optional TP of tower MLPs).  On a single chip both are 1.
    """

    data: int = 1
    model: int = 1
    # When True (default) the train step runs under shard_map with explicit
    # collectives (all_to_all embedding exchange, all_gather negatives, psum
    # grads) — auditable, Pallas-kernel-compatible.  When False, GSPMD
    # (jit + NamedSharding over the single-chip step) inserts collectives;
    # that path requires the jnp ops (no Pallas under the partitioner).
    explicit_collectives: bool = True
    # Share in-batch negatives across the data axis (global [B_local, B_global]
    # logit matrix instead of per-shard [B_local, B_local]).
    global_negatives: bool = True
    # Tensor-parallel feature MLPs over `model` (Megatron pattern: layer 0
    # column-split, activation shard-local, layer 1 row-split + one psum).
    # Off by default: at the reference's MLP sizes (IU -> 256 -> DU) the
    # latency of per-layer collectives exceeds the matmul saving; the knob
    # exists for wide-tower configs.  feature_hidden_dim must divide by the
    # model-axis size.
    tower_tp: bool = False
    # Compute the global-negative softmax denominator with a flash-style
    # ppermute ring (parallel.ring_loss) instead of all_gather: identical
    # semantics, O(B_local) memory at ANY global batch (the [B_global, DI]
    # pool never materializes), comm issued as n overlappable hops.  Wins
    # when B_global * DI is HBM-material (very large global batches);
    # requires global_negatives, incompatible with reward_model (which
    # needs the full score matrix anyway).
    ring_negatives: bool = False
    # Cross-chip table gradients (explicit path): "auto" exchanges DEDUP'D
    # (touched-row ids, grad rows) over `data` via all_gather + local
    # scatter-add whenever that moves fewer wire bytes than the dense
    # [V_shard, D] grad all-reduce; "on"/"off" force it.  A batch touches
    # O(B·(1+H)) of V rows, so at production table sizes the dense psum is
    # almost all zeros — this is the named fix for the 44%-efficiency wall
    # in scripts/scaling_prediction.py (VERDICT r3 #2).  Decision is
    # per-table and static (parallel.sparse_grads.sparse_exchange_wins).
    sparse_table_grads: str = "auto"


@dataclass(frozen=True)
class DataConfig:
    """Synthetic dataset (reference: train/train.py:20-79, with the label-shape
    defect fixed: labels are [B, T], not [B])."""

    num_samples: int = 1000
    num_users: int = 100
    num_items: int = 200  # corpus size C
    feature_dim: int = 8
    history_len: int = 10
    num_tasks: int = 1
    max_position: int = 10
    seed: int = 0
    # True plants an 8-group user-item affinity so recall is measurable;
    # False reproduces the reference demo's pure-noise labels
    # (train/train.py:53-55), where recall@k can only be random.
    structured: bool = True
    # Per-example history lengths in [1, H]: positions past the length are
    # padding, masked via Batch.history_len (the reference punts on variable
    # histories — two_tower_base_retrieval.py:177-181).
    variable_history: bool = False
    # Zipf exponent for item engagement: P(item rank r) ∝ 1/(r+1)^skew.
    # 0 keeps the uniform sampling of the reference demo; > 0 creates the
    # head-heavy popularity distribution where in-batch negatives
    # systematically over-punish popular items — the regime
    # ModelConfig.logq_correction / mixed_negatives exist for.
    popularity_skew: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    num_epochs: int = 2
    learning_rate: float = 1e-3
    # Global-norm gradient clipping before Adam (optax.clip_by_global_norm);
    # None/0 = off (reference parity — train/train.py:179 uses bare Adam).
    # The regime that needs it: large-batch training on popularity-skewed
    # data, where in-batch duplicate positives drive late-training grad-norm
    # growth and divergence (measured r4: the 65k/B=4096 Zipf anchor
    # diverges by epoch 7 at lr 3e-3 unclipped — BASELINE.md).
    grad_clip_norm: Optional[float] = None
    seed: int = 42
    # NOTE on the *_every gates: with steps_per_dispatch=K > 1 they fire at
    # DISPATCH boundaries — the first dispatch whose covered step range
    # crosses a multiple of N (e.g. K=4, checkpoint_every=10 saves at step
    # 12).  Set N % K == 0 for exact-step gating.
    log_every: int = 10
    eval_every: int = 0  # steps (dispatch-granular, see above); 0 = epoch end only
    eval_top_k: int = 100
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # steps (dispatch-granular, see above); 0 = disabled
    profile_dir: Optional[str] = None
    donate_state: bool = True
    # K optimizer steps per jitted dispatch (lax.scan): the scan carry
    # aliases state buffers perfectly where per-dispatch donation copies
    # them (~40% of the step at 134M params), and amortizes host dispatch.
    # 1 = one step per call (checkpoint/eval gates stay step-accurate).
    steps_per_dispatch: int = 1
    # Debug mode: jax_debug_nans aborts the step that first produces a NaN
    # with a de-optimized re-run pinpointing the op (SURVEY §5 sanitizers —
    # the functional model has no data races to detect, so NaN/Inf tracing
    # is the remaining numeric sanitizer).
    debug_nans: bool = False
    # Row-sparse table updates (training.sparse_tables): the step trains on
    # a gathered minitable of touched rows and applies LAZY Adam to those
    # rows only — table-size-independent update cost, no dense [V, D]
    # gradient.  Lazy-Adam semantics (untouched rows' moments don't decay);
    # dense path is reference-exact, so off by default.  Single-chip path
    # only; recommended for tables >= ~1M rows (BASELINE.md).
    lazy_table_adam: bool = False
    # 128-lane-packed storage for big id tables (nn.packed_table): tables
    # with dim | 128 and >= pack_tables_min_rows rows store P = 128/dim
    # logical rows per physical lane row.  This makes the Pallas O(updates)
    # scatter-add layout-clean at ANY table size (round 2's T(8,128) layout
    # infection padded the whole Adam cluster 2x above 2^22 rows and OOMed —
    # BASELINE.md).  Numerics-neutral.  Composes with the EXPLICIT mesh path
    # (packed shards row-shard over the model axis, parallel.embedding);
    # only GSPMD requires plain storage.
    pack_tables: bool = True
    pack_tables_min_rows: int = 1 << 22
    # Streaming logQ (training.freq_estimator): estimate item sampling
    # probability ONLINE from the training stream (decayed counts) instead
    # of the synthetic data's whole-dataset oracle ``catalog_logq`` — the
    # production-feed mode of ModelConfig.logq_correction (Yi et al. 2019).
    # State rides in TrainState.logq_state (checkpointed, donated).
    # logq_decay sets the effective window: ~1/(1-γ) batches.
    streaming_logq: bool = False
    logq_decay: float = 0.999
    # One-pass Pallas Adam (ops.pallas.fused_adam): same math/state as
    # optax.adam.  Off by default — measured ~1.1ms SLOWER end-to-end at the
    # bench config: the pallas_call acts as a fusion/scheduling barrier,
    # whereas XLA overlaps its native adam chain with the backward pass for
    # free (BASELINE.md).  Kept as a config point and parity-tested.
    fused_adam: bool = False


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# Presets — one per reference model class (BASELINE.json "configs").
# ---------------------------------------------------------------------------

def _hist() -> HistoryEncoderConfig:
    return HistoryEncoderConfig()


def resolve_kernel_flags(cfg: ModelConfig) -> ModelConfig:
    """Resolve AUTO (None) Pallas-kernel flags: enabled iff the default JAX
    backend is a TPU.

    The kernels are numerics-neutral but run INTERPRETED off-TPU (orders of
    magnitude slower), so the right default is backend-dependent — and a
    plain False default silently left the training loop on the dense XLA
    path at ~4.7x the step time of the kernelized bench (round-5 finding,
    BASELINE.md).  Entry points (training.loop.train, models.zoo builders,
    bench/graft entries) call this once; explicit True/False pass through
    untouched, so parity/ablation configs are unaffected.
    """
    import jax

    on_tpu = jax.default_backend() == "tpu"
    out = cfg
    if cfg.fused_loss is None:
        out = dataclasses.replace(out, fused_loss=on_tpu)
    he = cfg.history_encoder
    if he is not None and he.fused_encoder is None:
        # explicit per-layer / blockwise choices win over the auto default
        auto = on_tpu and not (he.fused_kernel or he.blockwise_kernel)
        out = dataclasses.replace(
            out, history_encoder=dataclasses.replace(he, fused_encoder=auto)
        )
    return out


def preset(name: str, **overrides) -> ModelConfig:
    """Named presets mirroring the reference model zoo.

    two_tower_base_retrieval          -> base towers, no history, no debias
    two_tower_with_user_history_encoder
    two_tower_with_position_debiased_weights
    two_tower_with_user_debiased_weights
    two_tower_with_debiasing
    two_tower_plus_light_ranker
    two_tower_plus_light_ranker_kd
    two_tower_with_main_ranker_reward
    """
    presets = {
        "two_tower_base_retrieval": dict(),
        "two_tower_with_user_history_encoder": dict(history_encoder=_hist()),
        "two_tower_with_position_debiased_weights": dict(
            history_encoder=_hist(), debias=Debias.POSITION
        ),
        "two_tower_with_user_debiased_weights": dict(
            history_encoder=_hist(), debias=Debias.USER
        ),
        "two_tower_with_debiasing": dict(history_encoder=_hist(), debias=Debias.BOTH),
        "two_tower_plus_light_ranker": dict(
            history_encoder=_hist(), debias=Debias.BOTH, light_ranker=LightRankerConfig()
        ),
        "two_tower_plus_light_ranker_kd": dict(
            history_encoder=_hist(),
            debias=Debias.BOTH,
            light_ranker=LightRankerConfig(),
            kd=True,
        ),
        "two_tower_with_main_ranker_reward": dict(
            history_encoder=_hist(), debias=Debias.BOTH, reward_model=True
        ),
    }
    if name not in presets:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(presets)}")
    kwargs = dict(presets[name])
    kwargs.update(overrides)
    return ModelConfig(**kwargs).validate()


PRESET_NAMES = (
    "two_tower_base_retrieval",
    "two_tower_with_user_history_encoder",
    "two_tower_with_position_debiased_weights",
    "two_tower_with_user_debiased_weights",
    "two_tower_with_debiasing",
    "two_tower_plus_light_ranker",
    "two_tower_plus_light_ranker_kd",
    "two_tower_with_main_ranker_reward",
)
