"""Bisect the rows_write hardware parity failure (parity run: rel err 1.18 @ 512k).

Cases isolate kernel-vs-merge:
  A: unique sorted physical ids, full bitmask (pure kernel semantics)
  B: same, small table
  C: the tpu_kernel_parity setup (merge_lane_blocks + duplicate no-op slots)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from two_tower_models_tpu.ops.pallas.rows_write import (
    merge_lane_blocks,
    rows_write,
    rows_write_reference,
)


def rel(a, b):
    a = jax.device_get(a).astype("float64")
    b = jax.device_get(b).astype("float64")
    import numpy as np

    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def run(tag, v, n, block_dim, tile_v=2048, seed=0):
    w = 128
    ks = jax.random.split(jax.random.key(seed), 3)
    dst = jax.random.normal(ks[0], (v, w), jnp.float32)
    # unique sorted physical ids
    ids = jnp.sort(
        jax.random.permutation(ks[1], jnp.arange(v, dtype=jnp.int32))[:n]
    )
    nblk = w // block_dim
    bits = jnp.full((n,), (1 << nblk) - 1, jnp.int32)
    vals = jax.random.normal(ks[2], (n, w), jnp.float32)
    got = jax.jit(
        lambda d, i, b, x: rows_write(d, i, b, x, block_dim=block_dim, tile_v=tile_v)
    )(dst, ids, bits, vals)
    want = rows_write_reference(dst, ids, bits, vals, block_dim)
    e = rel(got, want)
    # also: how many rows differ, and are untouched rows intact?
    import numpy as np

    g = jax.device_get(got)
    wnt = jax.device_get(want)
    bad = np.where(np.abs(g - wnt).max(axis=1) > 1e-5)[0]
    touched = set(jax.device_get(ids).tolist())
    bad_touched = sum(1 for r in bad if r in touched)
    print(
        f"{tag}: rel={e:.3e} bad_rows={len(bad)} (touched={bad_touched}, "
        f"untouched={len(bad) - bad_touched}) of v={v} n={n}",
        flush=True,
    )
    if len(bad) and len(bad) < 20:
        print(f"  bad rows: {bad[:20].tolist()}", flush=True)
    elif len(bad):
        print(
            f"  bad row range: [{bad.min()}, {bad.max()}], first tiles: "
            f"{sorted(set((bad // tile_v).tolist()))[:12]}",
            flush=True,
        )
    return e < 1e-6


def run_parity_case():
    rw_v, rw_n = 1 << 19, 65536
    rw_dst = jax.random.normal(jax.random.key(16), (rw_v, 128), jnp.float32)
    rw_lids = jnp.sort(jax.random.randint(jax.random.key(17), (rw_n,), 0, rw_v * 2))
    rw_dup = jnp.concatenate([jnp.zeros((1,), bool), rw_lids[1:] == rw_lids[:-1]])
    rw_rows = jax.random.normal(jax.random.key(18), (rw_n, 64), jnp.float32)
    pids, bits, vals = merge_lane_blocks(rw_lids, rw_dup, rw_rows, 2)
    got = jax.jit(lambda d, i, b, v: rows_write(d, i, b, v, block_dim=64))(
        rw_dst, pids, bits, vals
    )
    want = rows_write_reference(rw_dst, pids, bits, vals, 64)
    print(f"C (parity setup): rel={rel(got, want):.3e}", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "B"):
        run("B  v=16k n=2k", 1 << 14, 2048, 64)
    if which in ("all", "A"):
        run("A  v=512k n=64k", 1 << 19, 65536, 64)
    if which in ("all", "C"):
        run_parity_case()
