"""Flash-attention kernel correctness vs the XLA reference path.

Runs in Pallas interpret mode on CPU; the same kernel compiles on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicrafter_tpu.ops.attention import xla_attention
from dynamicrafter_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("lq,lk", [(256, 256), (320, 320), (2560, 2560),
                                   (640, 77)])
def test_flash_matches_xla(lq, lk):
    rng = np.random.default_rng(0)
    shape_q = (2, lq, 2, 64)
    shape_k = (2, lk, 2, 64)
    q = jnp.asarray(rng.standard_normal(shape_q).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape_k).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape_k).astype(np.float32))
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_extra_batch_dims():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 3, 130, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, 257, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, 257, 2, 32)).astype(np.float32))
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("lq,lk", [(256, 256), (320, 320), (640, 77),
                                   (2560, 2560)])
def test_flash_grad_matches_xla(lq, lk):
    """dq/dkv Pallas kernels (incl. padded q/kv tails) vs XLA autodiff."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, lq, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, lk, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, lk, 2, 32)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_flash_packed_grad_uses_flash_backward():
    """The packed layout's vjp must route through the Pallas _flash_bwd
    (shared with the nlhd path), never through an XLA softmax whose vjp
    materializes the (Lq, Lk) logits matrix — at L=2560+ that fallback was
    an OOM trap on the training path."""
    from unittest import mock

    from dynamicrafter_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 2560, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2560, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2560, 2, 32)).astype(np.float32))

    def loss_packed(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, interpret=True, packed=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    with mock.patch.object(fa, "_flash_bwd", wraps=fa._flash_bwd) as spy:
        gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        assert spy.called, "packed vjp did not hit the Pallas flash backward"
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_flash_residuals_saved_across_remat_boundary():
    """Under jax.checkpoint with save_only_these_names("flash_out",
    "flash_lse") — the per-layer remat policy in models/unet3d.py — the
    backward must (a) reproduce the no-remat gradients exactly and (b) NOT
    re-run the flash forward kernel in the rematted segment: the tagged
    out/lse residuals feed _flash_bwd directly (saves a measured
    174 ms/step of recompute at 576x1024)."""
    from dynamicrafter_tpu.models.unet3d import _flash_residual_policy

    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((1, 256, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 256, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 256, 2, 32)).astype(np.float32))

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    g_plain = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    f_policy = jax.checkpoint(f, policy=_flash_residual_policy())
    g_policy = jax.grad(f_policy, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_policy, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0)

    # kernel-call census in the traced backward: full remat re-runs the
    # flash forward inside the checkpointed segment; the policy must not
    f_full = jax.checkpoint(f)
    n_full = str(jax.make_jaxpr(jax.grad(f_full, argnums=(0, 1, 2)))(
        q, k, v)).count("pallas_call")
    n_policy = str(jax.make_jaxpr(jax.grad(f_policy, argnums=(0, 1, 2)))(
        q, k, v)).count("pallas_call")
    assert n_policy == n_full - 1, (n_policy, n_full)
