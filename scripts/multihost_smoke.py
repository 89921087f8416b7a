"""Real 2-process ``jax.distributed`` smoke test of the multihost layer.

Exercises what a TPU pod launch exercises, on CPU: ``initialize_multihost``
(parallel.mesh), a global mesh spanning both processes' devices, per-host
batch/catalog feeding (parallel.multihost), the explicit-collectives sharded
train step, and the mesh-sharded eval — end to end through the real
``training.loop.train``.

  parent:  python scripts/multihost_smoke.py            (spawns 2 workers)
  worker:  python scripts/multihost_smoke.py worker <i> <n> <port>

Parent exit 0 = both workers finished and reported IDENTICAL final loss and
recall (the global computation is the same on every host by construction).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCS = 2
LOCAL_DEVICES = 2  # per process -> 4 global


def worker(pid: int, nprocs: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from two_tower_models_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs * LOCAL_DEVICES

    from two_tower_models_tpu.config import (
        DataConfig,
        ExperimentConfig,
        MeshConfig,
        ModelConfig,
        TrainConfig,
    )
    from two_tower_models_tpu.training.loop import train
    from two_tower_models_tpu.utils.logging import JsonlLogger

    exp = ExperimentConfig(
        model=ModelConfig(
            user_id_hash_size=64,
            user_id_embedding_dim=16,
            item_id_hash_size=64,
            item_id_embedding_dim=16,
            user_features_size=8,
            item_features_size=8,
            feature_hidden_dim=32,
        ),
        mesh=MeshConfig(data=2, model=2),
        data=DataConfig(num_samples=256, num_items=64, feature_dim=8),
        train=TrainConfig(batch_size=16, num_epochs=2, log_every=0, eval_top_k=10),
    )
    summary = train(exp, JsonlLogger(echo=False))

    # Second pass: mixed negatives + logQ on skewed data — every host must
    # draw the SAME negatives (counter-folded keys) and the replicated [B\']
    # fields must lift correctly through global_batch_from_host_local.
    from dataclasses import replace as _replace

    exp2 = _replace(
        exp,
        model=_replace(exp.model, mixed_negatives=8, logq_correction=True),
        data=_replace(exp.data, popularity_skew=0.5),
    )
    summary2 = train(exp2, JsonlLogger(echo=False))

    # Third pass: STREAMING logQ (training.freq_estimator) — the negative
    # draw stays host-local, the correction columns attach in a global jit
    # from the replicated estimator; every host must advance the estimator
    # identically and report the same trajectory.
    exp3 = _replace(
        exp2, train=_replace(exp2.train, streaming_logq=True, logq_decay=0.99)
    )
    summary3 = train(exp3, JsonlLogger(echo=False))

    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "final_loss": round(float(summary["final_loss"]), 6),
                "recall": round(float(summary["recall_at_k"]), 6),
                "mns_final_loss": round(float(summary2["final_loss"]), 6),
                "mns_recall": round(float(summary2["recall_at_k"]), 6),
                "stream_final_loss": round(float(summary3["final_loss"]), 6),
                "stream_recall": round(float(summary3["recall_at_k"]), 6),
            }
        ),
        flush=True,
    )


def parent() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(i), str(N_PROCS), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(N_PROCS)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        if p.returncode != 0 or not lines:
            print(f"worker {i} FAILED (rc={p.returncode}):\n{out[-3000:]}")
            return 1
        results.append(json.loads(lines[-1][len("RESULT "):]))
    a, b = results
    a.pop("pid"), b.pop("pid")
    if a != b:
        print(f"MISMATCH across hosts: {a} vs {b}")
        return 1
    print(f"multihost smoke ok: 2 processes x {LOCAL_DEVICES} devices, "
          f"mesh (2,2), loss={a['final_loss']}, recall={a['recall']}, "
          f"mns_loss={a['mns_final_loss']}, mns_recall={a['mns_recall']}, "
          f"stream_loss={a['stream_final_loss']}, "
          f"stream_recall={a['stream_recall']}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(parent())
