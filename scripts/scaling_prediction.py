"""Predicted multi-chip scaling efficiency from the collective accounting.

Single-chip measurement in, predicted v5e-8 weak-scaling efficiency out —
the artifact behind BASELINE.md's "predicted scaling" section and the
falsifiable counterpart of the >=90% north-star target (VERDICT r2 #3).
Per-step collective volumes come from parallel.comms.step_collectives (the
same numbers tests/test_comms.py validates against the compiled HLO).

  python scripts/scaling_prediction.py --step-ms 6.9   # healthy-tunnel bench

Weak scaling: every chip keeps the measured per-chip batch (B_l = 4096), so
compute stays ~constant except the in-batch loss, whose [B_l, B_global]
matmuls grow linearly with the data axis — that growth is added to compute
from the config's FLOP count at a conservative 50% MXU efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--step-ms", type=float, default=6.9,
                   help="measured single-chip step at the per-chip batch")
    p.add_argument("--batch-per-chip", type=int, default=4096)
    p.add_argument("--rows", type=int, default=65536, help="id-table rows")
    p.add_argument("--ici-gbps", type=float, default=200.0,
                   help="per-chip ICI send bandwidth, GB/s (v5e: 1600 Gbps)")
    p.add_argument("--mxu-eff", type=float, default=0.5,
                   help="assumed MXU efficiency for the loss-growth FLOPs")
    p.add_argument("--ring", action="store_true",
                   help="predict with ring_negatives (ppermute ring instead "
                        "of the all_gather negative pool)")
    p.add_argument("--sparse", choices=["auto", "on", "off"], default="auto",
                   help="MeshConfig.sparse_table_grads: dedup'd (ids, rows) "
                        "table-grad exchange vs the dense [V_shard, D] psum")
    args = p.parse_args(argv)

    from two_tower_models_tpu.config import (
        Debias,
        HistoryEncoderConfig,
        MeshConfig,
        ModelConfig,
    )
    from two_tower_models_tpu.parallel.comms import (
        predict_step_time,
        step_collectives,
    )

    cfg = ModelConfig(
        user_id_hash_size=args.rows,
        user_id_embedding_dim=64,
        item_id_hash_size=args.rows,
        item_id_embedding_dim=64,
        user_features_size=16,
        item_features_size=16,
        user_value_weights=(1.0, 0.5, 0.25),
        history_len=32,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.BOTH,
        compute_dtype="bfloat16",
    )
    peak = 197e12 * args.mxu_eff
    b_l, di = args.batch_per_chip, cfg.item_id_embedding_dim

    for mesh in (
        MeshConfig(data=2, model=1, ring_negatives=args.ring,
                   sparse_table_grads=args.sparse),
        MeshConfig(data=4, model=1, ring_negatives=args.ring,
                   sparse_table_grads=args.sparse),
        MeshConfig(data=8, model=1, ring_negatives=args.ring,
                   sparse_table_grads=args.sparse),
        MeshConfig(data=4, model=2, ring_negatives=args.ring,
                   sparse_table_grads=args.sparse),
        MeshConfig(data=2, model=4, ring_negatives=args.ring,
                   sparse_table_grads=args.sparse),
    ):
        n = mesh.data * mesh.model
        b_g = b_l * mesh.data
        cs = step_collectives(cfg, mesh, global_batch=b_g)
        # loss growth: ~3 [B_l, B_g, DI] matmuls (fwd + dU + dI) beyond the
        # single-chip [B_l, B_l] baseline
        extra_flops = 3 * 2 * b_l * (b_g - b_l) * di
        compute_s = args.step_ms / 1e3 + extra_flops / peak
        serial = predict_step_time(cs, compute_s, args.ici_gbps * 1e9, overlap=0.0)
        overlap = predict_step_time(cs, compute_s, args.ici_gbps * 1e9, overlap=1.0)
        base_eff = (args.step_ms / 1e3) / serial["step_s"]
        print(
            json.dumps(
                {
                    "mesh": f"data={mesh.data} model={mesh.model}",
                    "chips": n,
                    "global_batch": b_g,
                    "wire_MB_per_chip_per_step": round(
                        serial["wire_bytes_per_chip"] / 2**20, 3
                    ),
                    "comm_ms": round(serial["comm_s"] * 1e3, 3),
                    "step_ms_no_overlap": round(serial["step_s"] * 1e3, 3),
                    "efficiency_no_overlap": round(base_eff, 3),
                    "efficiency_full_overlap": round(
                        (args.step_ms / 1e3) / overlap["step_s"], 3
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
