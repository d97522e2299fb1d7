"""Golden-value parity: our Flax UNet vs the reference torch UNet.

Builds a tiny-config reference UNetModel on CPU, randomizes every parameter,
converts the state dict with utils/weights.py, and compares outputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel  # noqa: E402
from dynamicrafter_tpu.utils import weights as W  # noqa: E402

TINY = dict(
    in_channels=8,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=[2, 1],
    channel_mult=[1, 2],
    num_head_channels=16,
    transformer_depth=1,
    context_dim=48,
    use_linear=True,
    use_checkpoint=False,
    temporal_conv=True,
    temporal_attention=True,
    temporal_selfatt_only=True,
    use_relative_position=False,
    use_causal_attention=False,
    temporal_length=4,
    addition_attention=True,
    image_cross_attention=True,
    image_cross_attention_scale_learnable=True,
    default_fs=3,
    fs_condition=True,
    dropout=0.0,
)


def randomize_(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g, dtype=torch.float32) * 0.05
    module.load_state_dict(sd)
    return module


@requires_reference
@pytest.mark.parametrize("variant", ["full", "plain_text_ctx", "no_fs"])
def test_unet_parity(variant):
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    cfg_kw = dict(TINY)
    if variant == "no_fs":
        cfg_kw["fs_condition"] = False
    ref = RefUNet(**cfg_kw).eval()
    randomize_(ref)

    b, t, h, w = 2, cfg_kw["temporal_length"], 8, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 8, t, h, w)).astype(np.float32)
    ts = np.array([3, 501], dtype=np.int64)
    fs = np.array([3, 24], dtype=np.int64)
    ctx_dim = cfg_kw["context_dim"]
    if variant == "plain_text_ctx":
        context = rng.standard_normal((b, 77, ctx_dim)).astype(np.float32)
    else:
        context = rng.standard_normal((b, 77 + t * 16, ctx_dim)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(x), torch.tensor(ts), context=torch.tensor(context),
            fs=torch.tensor(fs) if cfg_kw["fs_condition"] else None,
        ).numpy()

    params = W.convert_unet({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = UNetModel(UNetConfig.from_dict(cfg_kw))

    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # b t h w c
    if variant == "plain_text_ctx":
        ctx_text, ctx_img = jnp.asarray(context), None
    else:
        ctx_text = jnp.asarray(context[:, :77])
        ctx_img = jnp.asarray(context[:, 77:].reshape(b, t, 16, ctx_dim))

    import jax

    out = jax.jit(ours.apply)(
        {"params": params}, x_j, jnp.asarray(ts),
        context_text=ctx_text, context_img=ctx_img,
        fs=jnp.asarray(fs) if cfg_kw["fs_condition"] else None,
    )
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))  # back to b c t h w

    assert out.shape == out_ref.shape
    # fp32 accumulation noise through ~30 blocks; atol-only (values are O(0.05))
    np.testing.assert_allclose(out, out_ref, atol=1e-3, rtol=0)
    # and the bulk of elements should be much tighter
    assert np.median(np.abs(out - out_ref)) < 2e-4
