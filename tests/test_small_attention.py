"""Packed small-T temporal-attention kernel vs the XLA reference path.

Runs in Pallas interpret mode on CPU; the same kernel compiles on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicrafter_tpu.ops.attention import xla_attention
from dynamicrafter_tpu.ops.small_attention import small_t_attention


@pytest.mark.parametrize("t,heads,g", [(16, 4, 300), (8, 2, 130), (4, 1, 37)])
def test_small_t_matches_xla(t, heads, g):
    rng = np.random.default_rng(0)
    shape = (g, t, heads, 64)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(small_t_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_small_t_extra_batch_dims():
    rng = np.random.default_rng(1)
    shape = (2, 150, 16, 2, 32)   # (B, HW, T, H, D) temporal layout
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(small_t_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_small_t_grad_matches_xla():
    rng = np.random.default_rng(2)
    shape = (260, 16, 2, 32)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def loss_small(q, k, v):
        return jnp.sum(small_t_attention(q, k, v, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gs = jax.grad(loss_small, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_small_t_wide_heads_vmem_path():
    """hd=512 (init_attn at 1024-res) triggers the adaptive row-block
    reduction that keeps blocks under the scoped-VMEM limit; output must
    be unchanged."""
    rng = np.random.default_rng(5)
    shape = (160, 16, 8, 64)   # h*d = 512
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(small_t_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("t,heads,g", [(16, 4, 300), (8, 2, 130)])
def test_small_t_tmajor_matches_posmajor(t, heads, g):
    """Time-major packed kernel (consumes the (B, T, G, H, D) spatial-major
    layout directly, stripe mask) must match the position-major kernel and
    the XLA reference."""
    from dynamicrafter_tpu.ops.small_attention import small_t_attention_tmajor

    rng = np.random.default_rng(7)
    shape = (2, t, g, heads, 64)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = np.asarray(jnp.moveaxis(
        xla_attention(*(jnp.moveaxis(x, 1, 2) for x in (q, k, v))), 2, 1))
    out = np.asarray(small_t_attention_tmajor(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_attention_axis1_dispatch_and_fallback():
    """attention_axis1 forced onto the kernel path (backend='flash') and the
    moveaxis fallback (backend='xla') must agree."""
    from dynamicrafter_tpu.ops.attention import attention_axis1

    rng = np.random.default_rng(8)
    shape = (2, 16, 150, 2, 32)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    fast = np.asarray(attention_axis1(q, k, v, backend="flash"))
    ref = np.asarray(attention_axis1(q, k, v, backend="xla"))
    np.testing.assert_allclose(fast, ref, atol=2e-5, rtol=1e-4)


def test_small_t_tmajor_grad():
    from dynamicrafter_tpu.ops.small_attention import small_t_attention_tmajor

    rng = np.random.default_rng(9)
    shape = (1, 16, 140, 2, 32)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def loss_t(q, k, v):
        return jnp.sum(small_t_attention_tmajor(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        mv = lambda x: jnp.moveaxis(x, 1, 2)
        return jnp.sum(xla_attention(mv(q), mv(k), mv(v)) ** 2)

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gt, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_dispatch_selects_small_t(monkeypatch):
    """dot_product_attention routes qualifying temporal shapes to the packed
    kernel (forced via backend='flash' off-TPU)."""
    from dynamicrafter_tpu.ops import attention as A

    called = {}

    def fake_small(q, k, v, scale=None):
        called["yes"] = True
        return q

    monkeypatch.setattr("dynamicrafter_tpu.ops.small_attention.small_t_attention",
                        fake_small)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 200, 16, 2, 32)).astype(np.float32))
    A.dot_product_attention(x, x, x, backend="flash")
    assert called.get("yes")
