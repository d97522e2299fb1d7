"""Attention backend dispatch heuristics + broadcast semantics."""
import numpy as np

import jax.numpy as jnp

from dynamicrafter_tpu.ops.attention import (
    _use_flash, dot_product_attention, xla_attention,
)


def _q(l, h, d=64):
    return jnp.zeros((2, l, h, d))


def test_dispatch_rules_off_tpu():
    # CPU: never flash under "auto"
    assert not _use_flash(_q(9216, 5), _q(9216, 5), None, "auto")
    # explicit backend forces
    assert _use_flash(_q(256, 5), _q(256, 5), None, "flash")
    assert not _use_flash(_q(9216, 5), _q(9216, 5), None, "xla")
    # masks always go to the xla path (tiny temporal masks)
    mask = jnp.ones((16, 16), bool)
    assert not _use_flash(_q(9216, 5), _q(9216, 5), mask, "flash")


def test_broadcast_shared_context():
    """Text K/V shared across frames: (B, Lk, H, D) against (B, T, Lq, H, D)."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 3, 8, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 5, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 5, 2, 16)).astype(np.float32))
    out = dot_product_attention(q, k, v, backend="xla")
    # reference: tile k/v across the frame axis
    kt = jnp.broadcast_to(k[:, None], (2, 3, 5, 2, 16))
    vt = jnp.broadcast_to(v[:, None], (2, 3, 5, 2, 16))
    ref = xla_attention(q, kt, vt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_mask_semantics_matches_manual():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 4, 1, 8)).astype(np.float32))
    mask = jnp.tril(jnp.ones((4, 4), bool))
    out = np.asarray(dot_product_attention(q, q, q, mask=mask, backend="xla"))
    # row 0 can only attend to position 0 -> output equals v[0]
    np.testing.assert_allclose(out[0, 0, 0], np.asarray(q)[0, 0, 0], atol=1e-6)
