"""Fused GN+SiLU+conv3x3 kernel vs the unfused XLA reference path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fused_conv import fused_gn_silu_conv, supported
from dynamicrafter_tpu.ops.norms import GroupNorm


def _reference(x, kernel, bias, gscale, gbias, emb=None, groups=32, eps=1e-5):
    if emb is not None:
        x = x + emb[:, None, None, :]
    gn = GroupNorm(groups, epsilon=eps, num_batch_axes=1)
    normed = gn.apply({"params": {"scale": gscale, "bias": gbias}}, x)
    act = jax.nn.silu(normed)
    out = jax.lax.conv_general_dilated(
        act, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


@pytest.mark.parametrize("emb", [False, True])
@pytest.mark.parametrize("shape", [(2, 8, 12, 64), (1, 5, 7, 32)])
def test_fused_matches_reference(shape, emb):
    rng = np.random.default_rng(0)
    n, h, w, c = shape
    co = c
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, co)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32) * 0.1)
    gs = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2 + 1)
    gb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
    e = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32)) if emb \
        else None

    ref = np.asarray(_reference(x, k, b, gs, gb, e))
    out = np.asarray(fused_gn_silu_conv(x, k, b, gs, gb, e, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_supported_budget():
    assert supported((32, 40, 64, 320), 320)
    assert supported((32, 72, 128, 320), 320)   # 1024-res ds1
    assert not supported((16, 576, 1024, 128), 128)  # VAE decode: too big
