"""Weight interop with the torch reference (gauravchak/two_tower_models).

A reference user migrating here can load an existing torch ``state_dict``
directly into this framework's parameter pytree — and export back — without
retraining:

    sd = torch.load("ref.pt")          # or ref_model.state_dict()
    params = params_from_reference_state_dict(sd, cfg)

The name/layout map mirrors the reference modules exactly (verified to float
tolerance by ``scripts/identical_init_parity.py --import_check``, which
builds a torch-initialized reference, imports its state_dict, and compares
train losses):

    reference module (file:line)                     -> params leaf
    ----------------------------------------------------------------------
    user_id_embedding_arch  (two_tower_base_retrieval.py:70)   user_id_table
    user_features_arch.{0,2} (.py:76-80, Sequential)   user_features_mlp[i]
    user_tower_arch          (.py:90)                  user_tower_head
    item_id_embedding_arch   (.py:97)                  item_id_table
    item_features_arch.{0,2} (.py:101-105)             item_features_mlp[i]
    item_tower_arch          (.py:107)                 item_tower_head
    user_history_encoder.multihead_attn_layers.{i}
        (user_history_encoder.py:60-67)        history_encoder.attn_layers[i]
    position_bias_net_user_value
        (two_tower_with_position_debiased_weights.py:72)  position_bias_table
    user_debias_net_user_value.0
        (two_tower_with_user_debiased_weights.py:96-98,
         two_tower_with_debiasing.py:73-75)             user_debias_head
    ranker_user_tower        (two_tower_plus_light_ranker.py:79)
                                                        ranker_user_tower
    light_ranker             (.py:85)                   light_ranker_head

Layout conventions: torch ``nn.Linear`` stores weights ``[out, in]``; this
framework stores ``[in, out]`` (``x @ W + b``) — every linear transposes on
the way through.  Embedding tables and ``in_proj_weight``/``out_proj`` of
``nn.MultiheadAttention`` map with the same transpose rule (our fused QKV
``in_proj.w`` is ``[D, 3D]``, torch's ``in_proj_weight`` is ``[3D, D]``).

What canNOT come from a reference checkpoint — and doesn't need to:

  * the MIPS corpus, the positional-encoding table, and
    ``user_value_weights`` are plain tensors in the reference, EXCLUDED from
    its ``state_dict`` (a verified reference defect, SURVEY §2.4).  Here the
    PE is recomputed deterministically, the corpus is refreshed from the
    trained item tower, and ``user_value_weights`` lives in ``ModelConfig``.
  * params with no reference counterpart (``proxy_ranker`` — the reference's
    version is dead code never assigned to self,
    two_tower_base_plus_main_ranker_reward_model.py:62; the KD head's aux
    logit columns — the reference KD ``train_forward`` is ``pass``) keep
    their fresh initialization; ``strict`` only polices reference-side keys.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import numpy as np

from two_tower_models_tpu.config import Debias, ModelConfig
from two_tower_models_tpu.models.two_tower import init_params


def _np(x) -> np.ndarray:
    """Accept torch tensors (without importing torch) or array-likes."""
    if hasattr(x, "detach"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def params_from_reference_state_dict(
    state_dict: Mapping[str, object],
    cfg: ModelConfig,
    key: jax.Array | None = None,
    strict: bool = True,
) -> Dict:
    """Build this framework's parameter pytree from a reference state_dict.

    Every mappable reference entry overwrites the corresponding leaf of a
    freshly initialized pytree (``key`` seeds the leaves that have no
    reference counterpart; defaults to key 0).  With ``strict`` (default),
    raises ``KeyError`` on a reference key that maps to nothing in this
    config, or a mappable leaf missing from the state_dict — both signal a
    config/checkpoint mismatch.  Shape mismatches always raise.
    """
    params = init_params(key if key is not None else jax.random.key(0), cfg)
    dt = cfg.pdtype
    sd = dict(state_dict)
    consumed = set()

    def take(name: str, like, transpose: bool = False):
        if name not in sd:
            if strict:
                raise KeyError(
                    f"reference state_dict is missing '{name}' (required by "
                    f"this ModelConfig; pass strict=False to keep the fresh "
                    f"init for absent entries)"
                )
            return like
        consumed.add(name)
        arr = _np(sd[name])
        if transpose:
            arr = arr.T
        if arr.shape != like.shape:
            raise ValueError(
                f"'{name}' has shape {arr.shape}"
                + (" (after transpose)" if transpose else "")
                + f"; this config expects {like.shape}"
            )
        return arr.astype(dt)

    def linear(prefix: str, leaf: dict) -> dict:
        return {
            "w": take(f"{prefix}.weight", leaf["w"], transpose=True),
            "b": take(f"{prefix}.bias", leaf["b"]),
        }

    params["user_id_table"] = take(
        "user_id_embedding_arch.weight", params["user_id_table"]
    )
    params["item_id_table"] = take(
        "item_id_embedding_arch.weight", params["item_id_table"]
    )
    # feature MLPs are nn.Sequential(Linear, ReLU, Linear) -> indices 0, 2
    for side in ("user", "item"):
        mlp = params[f"{side}_features_mlp"]
        params[f"{side}_features_mlp"] = [
            linear(f"{side}_features_arch.{2 * i}", layer)
            for i, layer in enumerate(mlp)
        ]
    params["user_tower_head"] = linear("user_tower_arch", params["user_tower_head"])
    params["item_tower_head"] = linear("item_tower_arch", params["item_tower_head"])

    if cfg.history_encoder is not None:
        layers = params["history_encoder"]["attn_layers"]
        params["history_encoder"]["attn_layers"] = [
            {
                "in_proj": {
                    "w": take(
                        f"user_history_encoder.multihead_attn_layers."
                        f"{i}.in_proj_weight",
                        layer["in_proj"]["w"], transpose=True,
                    ),
                    "b": take(
                        f"user_history_encoder.multihead_attn_layers."
                        f"{i}.in_proj_bias",
                        layer["in_proj"]["b"],
                    ),
                },
                "out_proj": linear(
                    f"user_history_encoder.multihead_attn_layers.{i}.out_proj",
                    layer["out_proj"],
                ),
            }
            for i, layer in enumerate(layers)
        ]

    if cfg.debias in (Debias.POSITION, Debias.BOTH):
        params["position_bias_table"] = take(
            "position_bias_net_user_value.weight", params["position_bias_table"]
        )
    if cfg.debias in (Debias.USER, Debias.BOTH):
        # reference wraps the single Linear in an nn.Sequential -> index 0
        params["user_debias_head"] = linear(
            "user_debias_net_user_value.0", params["user_debias_head"]
        )

    if cfg.light_ranker is not None:
        params["ranker_user_tower"] = linear(
            "ranker_user_tower", params["ranker_user_tower"]
        )
        if not cfg.kd:
            params["light_ranker_head"] = linear(
                "light_ranker", params["light_ranker_head"]
            )
        elif "light_ranker.weight" in sd or strict:
            # KD widens the head to 2T (T hard + T aux columns,
            # two_tower_plus_light_ranker_plus_main_ranker_kd.py:10-19); a
            # reference checkpoint carries only the T hard columns (its KD
            # train_forward is `pass`).  Import them; aux columns keep init.
            head = params["light_ranker_head"]
            w = np.asarray(head["w"]).copy()
            b = np.asarray(head["b"]).copy()
            t = cfg.num_tasks
            w[:, :t] = _np(sd["light_ranker.weight"]).T
            b[:t] = _np(sd["light_ranker.bias"])
            consumed.update(("light_ranker.weight", "light_ranker.bias"))
            params["light_ranker_head"] = {"w": w.astype(dt), "b": b.astype(dt)}

    if strict:
        unused = sorted(set(sd) - consumed)
        if unused:
            raise KeyError(
                f"reference state_dict entries with no counterpart in this "
                f"ModelConfig: {unused} — wrong config/preset for this "
                f"checkpoint? (pass strict=False to ignore)"
            )
    return jax.tree.map(lambda x: jax.numpy.asarray(x), params)


def reference_state_dict_from_params(params: Dict, cfg: ModelConfig) -> Dict:
    """Export this framework's params under the reference's state_dict names
    (numpy arrays, torch layouts) — the exact inverse of
    ``params_from_reference_state_dict`` for every mappable leaf.  Load with
    ``ref_model.load_state_dict({k: torch.from_numpy(v) for ...}, strict=False)``
    (non-strict only because torch tracks no extra keys here; the reference's
    non-persistent tensors never appear in either direction)."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix: str, leaf: dict):
        sd[f"{prefix}.weight"] = _np(leaf["w"]).T.copy()
        sd[f"{prefix}.bias"] = _np(leaf["b"]).copy()

    sd["user_id_embedding_arch.weight"] = _np(params["user_id_table"]).copy()
    sd["item_id_embedding_arch.weight"] = _np(params["item_id_table"]).copy()
    for side in ("user", "item"):
        for i, layer in enumerate(params[f"{side}_features_mlp"]):
            put_linear(f"{side}_features_arch.{2 * i}", layer)
    put_linear("user_tower_arch", params["user_tower_head"])
    put_linear("item_tower_arch", params["item_tower_head"])
    if cfg.history_encoder is not None:
        for i, layer in enumerate(params["history_encoder"]["attn_layers"]):
            p = f"user_history_encoder.multihead_attn_layers.{i}"
            sd[f"{p}.in_proj_weight"] = _np(layer["in_proj"]["w"]).T.copy()
            sd[f"{p}.in_proj_bias"] = _np(layer["in_proj"]["b"]).copy()
            put_linear(f"{p}.out_proj", layer["out_proj"])
    if cfg.debias in (Debias.POSITION, Debias.BOTH):
        sd["position_bias_net_user_value.weight"] = _np(
            params["position_bias_table"]
        ).copy()
    if cfg.debias in (Debias.USER, Debias.BOTH):
        put_linear("user_debias_net_user_value.0", params["user_debias_head"])
    if cfg.light_ranker is not None:
        put_linear("ranker_user_tower", params["ranker_user_tower"])
        if not cfg.kd:
            put_linear("light_ranker", params["light_ranker_head"])
        else:  # export only the T hard-label columns the reference knows
            t = cfg.num_tasks
            sd["light_ranker.weight"] = _np(params["light_ranker_head"]["w"]).T[
                :t
            ].copy()
            sd["light_ranker.bias"] = _np(params["light_ranker_head"]["b"])[
                :t
            ].copy()
    return sd
