"""Update-count-scaling scatter kernel (ops/pallas/scatter_add.py) vs the
plain XLA scatter.  Interpret mode on the CPU test backend; the same code
Mosaic-compiles on TPU (scripts/tpu_kernel_parity.py covers hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.ops.pallas.scatter_add import (
    rows_scatter_add,
    rows_scatter_add_reference,
)


@pytest.mark.parametrize(
    "v,d,n,tile",
    [
        (300, 33, 777, 64),  # unaligned everything
        (512, 64, 100, 128),  # sparse updates
        (64, 128, 4096, 64),  # dense collisions (64 ids, 4096 updates)
        (2048, 64, 0, 256),  # no updates at all
    ],
)
def test_matches_xla_scatter(v, d, n, tile):
    ids = jax.random.randint(jax.random.key(0), (n,), 0, v)
    rows = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)
    out = rows_scatter_add(ids, rows, v, tile_v=tile)
    ref = rows_scatter_add_reference(ids, rows, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_all_updates_one_row():
    # heavy duplication: every update lands on one table row
    n, v, d = 1000, 128, 64
    ids = jnp.full((n,), 7, jnp.int32)
    rows = jnp.ones((n, d), jnp.float32)
    out = rows_scatter_add(ids, rows, v, tile_v=64)
    assert float(out[7].min()) == float(out[7].max()) == n
    assert float(jnp.abs(out).sum()) == n * d


def test_boundary_ids():
    # ids exactly on tile boundaries
    v, d, tile = 256, 64, 64
    ids = jnp.asarray([0, 63, 64, 127, 128, 191, 192, 255], jnp.int32)
    rows = jnp.ones((8, d), jnp.float32)
    out = rows_scatter_add(ids, rows, v, tile_v=tile)
    ref = rows_scatter_add_reference(ids, rows, v)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_lookup_vjp_uses_same_math():
    """The embedding_lookup VJP (XLA path on CPU) matches autodiff of take."""
    from two_tower_models_tpu.nn.layers import embedding_lookup

    table = jax.random.normal(jax.random.key(0), (96, 16))
    ids = jax.random.randint(jax.random.key(1), (4, 7), 0, 96)

    def loss_custom(t):
        return jnp.sum(embedding_lookup(t, ids) ** 2)

    def loss_plain(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(table)),
        np.asarray(jax.grad(loss_plain)(table)),
        rtol=1e-6,
    )
