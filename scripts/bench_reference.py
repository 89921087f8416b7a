"""Measure the PyTorch reference's train-step throughput (CPU) at the same
config bench.py uses, to anchor ``vs_baseline`` (the reference publishes no
numbers — BASELINE.md).

Uses the reference's TwoTowerWithDebiasing (history encoder + combined
debiasing) — the deepest *working* model in its zoo.  Run:

    PYTHONPATH=/root/reference python scripts/bench_reference.py
"""

import json
import os
import statistics
import sys
import time

# the torch reference lives outside the repo; auto-locate the default mount
if os.path.isdir("/root/reference") and "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

import torch

from src.two_tower_with_debiasing import TwoTowerWithDebiasing
from src.baseline_mips_module import BaselineMIPSModule

B = 4096
DU = DI = 64
FEAT = 16
H = 32
TABLE = 65536
T = 3

torch.manual_seed(0)

mips = BaselineMIPSModule(corpus_size=1000, embedding_dim=DI)
model = TwoTowerWithDebiasing(
    num_items=10,
    user_id_hash_size=TABLE,
    user_id_embedding_dim=DU,
    user_features_size=FEAT,
    user_history_seqlen=H,
    item_id_hash_size=TABLE,
    item_id_embedding_dim=DI,
    item_features_size=FEAT,
    user_value_weights=[1.0, 0.5, 0.25],
    mips_module=mips,
)
opt = torch.optim.Adam(model.parameters(), lr=1e-3)

user_id = torch.randint(0, TABLE, (B,))
user_features = torch.randn(B, FEAT)
user_history = torch.randint(0, TABLE, (B, H))
item_id = torch.randint(0, TABLE, (B,))
item_features = torch.randn(B, FEAT)
position = torch.randint(0, 100, (B,))
labels = torch.randint(0, 2, (B, T)).float()


def step():
    loss = model.train_forward(
        user_id, user_features, user_history, item_id, item_features, position, labels
    )
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.item())


for _ in range(2):  # warmup
    step()

times = []
for _ in range(5):
    t0 = time.perf_counter()
    step()
    times.append(time.perf_counter() - t0)

step_s = statistics.median(times)
print(
    json.dumps(
        {
            "reference_examples_per_sec": round(B / step_s, 1),
            "median_step_ms": round(step_s * 1e3, 1),
            "batch_size": B,
        }
    )
)
