"""History encoder: shape contract + semantic property tests.

The reference's golden values (tests/test_user_history_enc.py) encode torch's
init and cannot transfer; these property tests pin the same *semantics*:
mean-pool exactness, positional-encoding order sensitivity, PE flip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from two_tower_models_tpu.config import HistoryEncoderConfig
from two_tower_models_tpu.models.history_encoder import (
    history_encoder_apply,
    history_encoder_init,
    sinusoidal_positional_encoding,
)

B, H, DI = 4, 8, 16
CFG_PE = HistoryEncoderConfig(num_heads=2, num_layers=2, use_positional_encoding=True)
CFG_NOPE = HistoryEncoderConfig(num_heads=2, num_layers=2, use_positional_encoding=False)


def _params(cfg):
    return history_encoder_init(jax.random.key(0), DI, cfg)


def _hist(key=1):
    return jax.random.normal(jax.random.key(key), (B, H, DI))


def test_output_shape():
    out = history_encoder_apply(_params(CFG_PE), _hist(), CFG_PE)
    assert out.shape == (B, 2, DI)


def test_mean_pool_row_is_exact_mean():
    """Row 1 of the summary is the raw mean over H (pre-attention, pre-PE) —
    user_history_encoder.py:89, 118-120."""
    hist = _hist()
    out = history_encoder_apply(_params(CFG_PE), hist, CFG_PE)
    np.testing.assert_allclose(
        np.asarray(out[:, 1, :]), np.asarray(jnp.mean(hist, axis=1)), rtol=1e-5
    )


def test_without_pe_tail_permutation_invariant():
    """With PE off, self-attention is permutation-equivariant: shuffling
    positions 1..H-1 leaves the position-0 output (and the mean) unchanged."""
    params = _params(CFG_NOPE)
    hist = _hist()
    perm = jnp.concatenate([jnp.array([0]), 1 + jax.random.permutation(jax.random.key(9), H - 1)])
    out1 = history_encoder_apply(params, hist, CFG_NOPE)
    out2 = history_encoder_apply(params, hist[:, perm, :], CFG_NOPE)
    np.testing.assert_allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]), atol=1e-5)


def test_with_pe_tail_permutation_changes_output():
    """With PE on, order matters — the whole point of the encoding."""
    params = _params(CFG_PE)
    hist = _hist()
    perm = jnp.concatenate([jnp.array([0]), 1 + jax.random.permutation(jax.random.key(9), H - 1)])
    out1 = history_encoder_apply(params, hist, CFG_PE)
    out2 = history_encoder_apply(params, hist[:, perm, :], CFG_PE)
    assert float(jnp.abs(out1[:, 0] - out2[:, 0]).max()) > 1e-4


def test_pe_formula_and_flip():
    """PE matches the reference's double-loop formula (user_history_encoder.py
    :69-78), flipped so the newest (index-0) item carries the largest
    position's encoding (:54)."""
    import math

    pe = np.asarray(sinusoidal_positional_encoding(H, DI))
    expected = np.zeros((H, DI))
    for pos in range(H):
        for i in range(0, DI, 2):
            expected[pos, i] = math.sin(pos / (10000 ** ((2 * i) / DI)))
            if i + 1 < DI:
                expected[pos, i + 1] = math.cos(pos / (10000 ** ((2 * (i + 1)) / DI)))
    expected = expected[::-1]
    np.testing.assert_allclose(pe, expected, atol=1e-6)


def test_gradients_flow_through_attention():
    params = _params(CFG_PE)
    hist = _hist()

    def loss(p):
        return jnp.sum(history_encoder_apply(p, hist, CFG_PE) ** 2)

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0, f"dead gradient at {path}"
