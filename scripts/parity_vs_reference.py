"""Loss-curve parity: this framework vs the PyTorch reference.

Protocol (SURVEY §6 / BASELINE.md): identical synthetic data (generated once,
shared as numpy), identical batch order, identical hyperparameters (demo
scale: tables 1024, DU=DI=32, feat 8, H=10, B=32, Adam lr=1e-3), N init
seeds per framework.  Inits differ across frameworks (same distributions,
different RNGs), so the claim is distributional: per-epoch mean loss curves
agree within cross-seed spread.

Run:  PYTHONPATH=/root/reference:. python scripts/parity_vs_reference.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the torch reference lives outside the repo; auto-locate the default mount
if os.path.isdir("/root/reference") and "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

SEEDS = [0, 1, 2, 3, 4]
EPOCHS = 3
B = 32
N_SAMPLES = 640
DIMS = dict(tables=1024, emb=32, feat=8, hist=10, corpus=200)


def make_data(seed=123):
    rng = np.random.RandomState(seed)
    n = N_SAMPLES
    return dict(
        user_ids=rng.randint(0, 100, n).astype(np.int64),
        item_ids=rng.randint(0, DIMS["corpus"], n).astype(np.int64),
        user_features=rng.randn(n, DIMS["feat"]).astype(np.float32),
        item_features=rng.randn(n, DIMS["feat"]).astype(np.float32),
        user_history=rng.randint(0, DIMS["corpus"], (n, DIMS["hist"])).astype(np.int64),
        positions=rng.randint(0, 10, n).astype(np.int64),
        labels=rng.randint(0, 2, (n, 1)).astype(np.float32),
        order=[rng.permutation(n) for _ in range(EPOCHS)],
    )


def run_torch(data, seed):
    import torch

    from src.baseline_mips_module import BaselineMIPSModule
    from src.two_tower_base_retrieval import TwoTowerBaseRetrieval

    torch.manual_seed(seed)
    model = TwoTowerBaseRetrieval(
        num_items=10,
        user_id_hash_size=DIMS["tables"],
        user_id_embedding_dim=DIMS["emb"],
        user_features_size=DIMS["feat"],
        item_id_hash_size=DIMS["tables"],
        item_id_embedding_dim=DIMS["emb"],
        item_features_size=DIMS["feat"],
        user_value_weights=[1.0],
        mips_module=BaselineMIPSModule(DIMS["corpus"], DIMS["emb"]),
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    t = {k: torch.from_numpy(v) for k, v in data.items() if k != "order"}
    curves = []
    for ep in range(EPOCHS):
        losses = []
        for i in range(N_SAMPLES // B):
            idx = torch.from_numpy(data["order"][ep][i * B : (i + 1) * B])
            loss = model.train_forward(
                t["user_ids"][idx],
                t["user_features"][idx],
                t["user_history"][idx],
                t["item_ids"][idx],
                t["item_features"][idx],
                t["positions"][idx],
                t["labels"][idx],
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.item()))
        curves.append(float(np.mean(losses)))
    return curves


def run_jax(data, seed):
    import jax

    # Tiny workload; run on CPU so the script works alongside TPU users and
    # regardless of accelerator plugins.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from two_tower_models_tpu.config import ModelConfig
    from two_tower_models_tpu.models.two_tower import Batch, init_params, train_loss

    cfg = ModelConfig(
        user_id_hash_size=DIMS["tables"],
        user_id_embedding_dim=DIMS["emb"],
        user_features_size=DIMS["feat"],
        item_id_hash_size=DIMS["tables"],
        item_id_embedding_dim=DIMS["emb"],
        item_features_size=DIMS["feat"],
        user_value_weights=(1.0,),
        history_len=DIMS["hist"],
    )
    params = init_params(jax.random.key(seed), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(train_loss, has_aux=True)(
            params, cfg, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    arrays = {k: jnp.asarray(v) for k, v in data.items() if k != "order"}
    curves = []
    for ep in range(EPOCHS):
        losses = []
        for i in range(N_SAMPLES // B):
            idx = jnp.asarray(data["order"][ep][i * B : (i + 1) * B])
            batch = Batch(
                user_id=arrays["user_ids"][idx],
                user_features=arrays["user_features"][idx],
                user_history=arrays["user_history"][idx],
                item_id=arrays["item_ids"][idx],
                item_features=arrays["item_features"][idx],
                position=arrays["positions"][idx],
                labels=arrays["labels"][idx],
            )
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        curves.append(float(np.mean(losses)))
    return curves


def main():
    data = make_data()
    torch_curves = np.array([run_torch(data, s) for s in SEEDS])
    jax_curves = np.array([run_jax(data, s) for s in SEEDS])

    report = {
        "epochs": EPOCHS,
        "seeds": SEEDS,
        "torch_mean": torch_curves.mean(0).round(4).tolist(),
        "torch_std": torch_curves.std(0).round(4).tolist(),
        "jax_mean": jax_curves.mean(0).round(4).tolist(),
        "jax_std": jax_curves.std(0).round(4).tolist(),
    }
    # parity criterion: per-epoch means within 3x combined cross-seed std
    gaps = np.abs(torch_curves.mean(0) - jax_curves.mean(0))
    tol = 3 * (torch_curves.std(0) + jax_curves.std(0)) + 0.02
    report["parity"] = bool((gaps <= tol).all())
    report["gaps"] = gaps.round(4).tolist()
    report["tolerance"] = tol.round(4).tolist()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
