"""Pallas kernels under the sp mesh must run PER-SHARD via shard_map.

GSPMD treats pallas_call as an opaque custom call: without the explicit
shard_map in ops/attention.py, a seq-sharded operand would be
all-gathered around the kernel (involuntary replication — the failure
mode tests/test_sp_collectives.py forbids for the rest of the graph).
Validated on the virtual 8-device CPU mesh with interpret-mode kernels:
sharded execution must match the unsharded kernel numerically and emit
no all-gather.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamicrafter_tpu.ops.attention import (
    attention_axis1, dot_product_attention,
)
from dynamicrafter_tpu.parallel.sharding import (
    SEQ_AXIS, create_mesh, use_mesh,
)


def _mesh_or_skip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(dp=1, sp=8)


def test_flash_kernel_sharded_matches_unsharded():
    mesh = _mesh_or_skip()
    rng = np.random.default_rng(0)
    # (B, T, L, H, D): spatial attention layout; T carries 'sp'
    q, k, v = (jnp.asarray(rng.standard_normal((2, 8, 256, 2, 16)),
                           jnp.float32) for _ in range(3))

    ref = dot_product_attention(q, k, v, backend="flash")

    with use_mesh(mesh):
        xs = NamedSharding(mesh, P(None, SEQ_AXIS))
        f = jax.jit(
            lambda a, b, c: dot_product_attention(a, b, c, backend="flash"),
            in_shardings=(xs, xs, xs))
        lowered = f.lower(*(jax.device_put(t, xs) for t in (q, k, v)))
        hlo = lowered.compile().as_text()
        out = f(*(jax.device_put(t, xs) for t in (q, k, v)))
    assert "all-gather" not in hlo
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_small_t_tmajor_kernel_sharded_matches_unsharded():
    mesh = _mesh_or_skip()
    rng = np.random.default_rng(1)
    # (B, T, G, H, D): temporal attention layout; G carries 'sp'
    q, k, v = (jnp.asarray(rng.standard_normal((2, 4, 16, 2, 8)),
                           jnp.float32) for _ in range(3))

    ref = attention_axis1(q, k, v, backend="flash")

    with use_mesh(mesh):
        xs = NamedSharding(mesh, P(None, None, SEQ_AXIS))
        f = jax.jit(
            lambda a, b, c: attention_axis1(a, b, c, backend="flash"),
            in_shardings=(xs, xs, xs))
        lowered = f.lower(*(jax.device_put(t, xs) for t in (q, k, v)))
        hlo = lowered.compile().as_text()
        out = f(*(jax.device_put(t, xs) for t in (q, k, v)))
    assert "all-gather" not in hlo
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_kernel_sharded_grads_match():
    mesh = _mesh_or_skip()
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 8, 256, 2, 16)),
                           jnp.float32) for _ in range(3))

    def loss(fn, a, b, c):
        return jnp.square(fn(a, b, c)).mean()

    ref_g = jax.grad(
        lambda a, b, c: loss(
            lambda *t: dot_product_attention(*t, backend="flash"), a, b, c),
        argnums=(0, 1, 2))(q, k, v)

    with use_mesh(mesh):
        xs = NamedSharding(mesh, P(None, SEQ_AXIS))
        g = jax.jit(jax.grad(
            lambda a, b, c: loss(
                lambda *t: dot_product_attention(*t, backend="flash"),
                a, b, c), argnums=(0, 1, 2)),
            in_shardings=(xs, xs, xs))(
            *(jax.device_put(t, xs) for t in (q, k, v)))
    for a, b in zip(g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)
