"""Tunnel/session health microprobe: the three latencies that contextualize
every other number taken in a session.

  eager_op_ms     — one tiny eager device op (a [8,128] add), closed by a
                    scalar device_get: the cost of EVERY un-jitted op the
                    host issues (the fused-dispatch loop exists to get these
                    out of the train loop's inner path).
  dispatch_ms     — one cached-jit call of a trivial fn, closed the same
                    way: the floor for any jitted step's wall time.
  device_get_ms   — a scalar fetch alone (the sync tax itself).
  compile_s       — wall time to compile a fresh trivial jit (new shape):
                    distinguishes "slow-compile day" (round-3/round-5
                    symptom: minutes per XLA compile over the tunnel) from
                    "slow-execution day" (round-2/3 symptom: every dispatch
                    15-25% slow).

Timing: min over repeats for the op probes (noise only inflates); one shot
for compile.  Methodology per BASELINE.md: block_until_ready lies on the
axon tunnel, so every measurement closes with a scalar jax.device_get.

  python scripts/tunnel_probe.py
"""

from __future__ import annotations

import json
import time


def _min_ms(fn, repeats=20):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    backend = jax.default_backend()
    init_s = time.perf_counter() - t0

    x = jnp.ones((8, 128), jnp.float32)
    jax.device_get(jnp.sum(x))  # warm the path

    # scalar fetch alone
    s = jnp.float32(1.0) + jnp.float32(1.0)
    device_get_ms = _min_ms(lambda: jax.device_get(s))

    # tiny eager op + sync
    def eager():
        y = x + 1.0
        jax.device_get(y[0, 0])

    eager_op_ms = _min_ms(eager)

    f = jax.jit(lambda a: a * 2.0 + 1.0)
    jax.device_get(f(x)[0, 0])  # compile once

    def dispatch():
        jax.device_get(f(x)[0, 0])

    dispatch_ms = _min_ms(dispatch)

    # fresh compile: a new shape so the cache can't serve it.  Keep the
    # program trivial — this times the compile ROUND TRIP, not XLA effort.
    z = jnp.ones((16, 256), jnp.float32)
    g = jax.jit(lambda a: jnp.tanh(a) @ a.T)
    t0 = time.perf_counter()
    jax.device_get(g(z)[0, 0])
    compile_s = time.perf_counter() - t0

    print(json.dumps({
        "backend": backend,
        "init_s": round(init_s, 2),
        "device_get_ms": round(device_get_ms, 3),
        "eager_op_ms": round(eager_op_ms, 3),
        "dispatch_ms": round(dispatch_ms, 3),
        "compile_s": round(compile_s, 2),
    }))


if __name__ == "__main__":
    main()
