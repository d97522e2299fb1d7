"""Parity tests for the conditioning stack: Resampler and CLIP towers.

The Resampler is compared against the reference torch implementation.
The CLIP towers are compared against a torch oracle assembled here with
nn.MultiheadAttention in the exact open_clip checkpoint layout — this
validates both the Flax modules and the in_proj-splitting converter.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamicrafter_tpu.models.clip import (  # noqa: E402
    CLIPTextConfig, CLIPTextEncoder, CLIPVisionConfig, CLIPVisionEncoder,
    clip_preprocess,
)
from dynamicrafter_tpu.models.resampler import Resampler, ResamplerConfig  # noqa: E402
from dynamicrafter_tpu.utils import weights as W  # noqa: E402


def randomize_(module, seed=0, std=0.05):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("attn_mask"):  # registered buffer, must stay causal
            continue
        sd[k] = torch.randn(v.shape, generator=g, dtype=torch.float32) * std
    module.load_state_dict(sd)
    return module


@requires_reference
def test_resampler_parity():
    from lvdm.modules.encoders.resampler import Resampler as RefResampler

    cfg = ResamplerConfig(dim=64, depth=2, dim_head=16, heads=4, num_queries=4,
                          embedding_dim=48, output_dim=56, ff_mult=2,
                          video_length=3)
    ref = RefResampler(dim=cfg.dim, depth=cfg.depth, dim_head=cfg.dim_head,
                       heads=cfg.heads, num_queries=cfg.num_queries,
                       embedding_dim=cfg.embedding_dim, output_dim=cfg.output_dim,
                       ff_mult=cfg.ff_mult, video_length=cfg.video_length).eval()
    randomize_(ref)
    x = np.random.default_rng(0).standard_normal((2, 17, 48)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()

    params = W.convert_resampler({k: v.numpy() for k, v in ref.state_dict().items()})
    out = np.asarray(jax.jit(Resampler(cfg).apply)({"params": params}, jnp.asarray(x)))
    assert out.shape == out_ref.shape == (2, 12, 56)
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=0)


# ---------------------------------------------------------------------------
# torch oracle in open_clip layout
# ---------------------------------------------------------------------------

class _OracleBlock(torch.nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(width)
        self.attn = torch.nn.MultiheadAttention(width, heads, batch_first=False)
        self.ln_2 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.Sequential()
        self.mlp.add_module("c_fc", torch.nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", torch.nn.GELU())
        self.mlp.add_module("c_proj", torch.nn.Linear(width * 4, width))

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _OracleTextTower(torch.nn.Module):
    """open_clip text-tower layout: model.token_embedding etc."""

    def __init__(self, vocab, width, heads, layers, ctx):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(torch.empty(ctx, width))
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_OracleBlock(width, heads) for _ in range(layers)])
        self.ln_final = torch.nn.LayerNorm(width)
        mask = torch.full((ctx, ctx), float("-inf"))
        self.register_buffer("attn_mask", torch.triu(mask, diagonal=1))

    def forward(self, tokens, penultimate=True):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        n = len(self.transformer.resblocks) - (1 if penultimate else 0)
        for block in self.transformer.resblocks[:n]:
            x = block(x, attn_mask=self.attn_mask)
        return self.ln_final(x.permute(1, 0, 2))


class _OracleVisionTower(torch.nn.Module):
    """open_clip visual layout returning all tokens (no ln_post/proj)."""

    def __init__(self, width, heads, layers, patch, image):
        super().__init__()
        grid = image // patch
        self.conv1 = torch.nn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.empty(width))
        self.positional_embedding = torch.nn.Parameter(
            torch.empty(grid * grid + 1, width))
        self.ln_pre = torch.nn.LayerNorm(width)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_OracleBlock(width, heads) for _ in range(layers)])

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        for block in self.transformer.resblocks:
            x = block(x)
        return x.permute(1, 0, 2)


def test_clip_text_parity():
    cfg = CLIPTextConfig(vocab_size=100, width=32, heads=4, layers=3,
                         context_length=16, penultimate=True)
    oracle = randomize_(
        _OracleTextTower(100, 32, 4, 3, 16).eval(), seed=0, std=0.1)
    tokens = np.random.default_rng(0).integers(0, 100, (2, 16)).astype(np.int64)
    with torch.no_grad():
        out_ref = oracle(torch.tensor(tokens)).numpy()

    sd = {"model." + k: v.numpy() for k, v in oracle.state_dict().items()}
    params = W.convert_clip_text(sd, n_layers=cfg.layers - 1)
    out = np.asarray(jax.jit(CLIPTextEncoder(cfg).apply)(
        {"params": params}, jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=0)


def test_clip_vision_parity():
    cfg = CLIPVisionConfig(width=32, heads=4, layers=2, patch_size=8,
                           image_size=32)
    oracle = randomize_(
        _OracleVisionTower(32, 4, 2, 8, 32).eval(), seed=1, std=0.1)
    x = np.random.default_rng(1).standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = oracle(torch.tensor(x)).numpy()

    sd = {"model.visual." + k: v.numpy() for k, v in oracle.state_dict().items()}
    params = W.convert_clip_vision(sd)
    out = np.asarray(jax.jit(CLIPVisionEncoder(cfg).apply)(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert out.shape == (2, 17, 32)
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=0)


def test_clip_preprocess_matches_torch_bicubic():
    """Our constant-matrix bicubic align_corners resize vs torch."""
    x = np.random.default_rng(0).standard_normal((1, 3, 40, 56)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.tensor(x), size=(24, 24), mode="bicubic", align_corners=True
        ).numpy()
    ours = np.asarray(clip_preprocess(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), out_size=24,
        antialias=False))
    # undo the CLIP renorm to compare raw resize
    from dynamicrafter_tpu.models.clip import CLIP_MEAN, CLIP_STD
    ours = ours * CLIP_STD + CLIP_MEAN
    ours = ours * 2.0 - 1.0
    ours = np.transpose(ours, (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=0)


def _kornia_resize_antialias_oracle(x: "torch.Tensor", out_size: int):
    """torch reimplementation of kornia.geometry.resize(...,'bicubic',
    align_corners=True, antialias=True) (the reference preprocess,
    condition.py:322-326): gaussian pre-blur with sigma=(factor-1)/2 per
    axis (clamped to 0.001), ksize=max(4*sigma,3) rounded to odd, reflect
    padding, then bicubic align-corners interpolation. kornia itself is not
    installed in this image, so the algorithm is reproduced from its source.
    """
    import torch.nn.functional as F

    h, w = x.shape[-2:]
    factors = (h / out_size, w / out_size)
    if max(factors) > 1:
        kernels = []
        for f in factors:
            sigma = max((f - 1.0) / 2.0, 0.001)
            ks = int(max(2.0 * 2 * sigma, 3))
            ks += 1 - ks % 2
            g = torch.exp(-(torch.arange(ks, dtype=torch.float64)
                            - (ks - 1) / 2) ** 2 / (2 * sigma ** 2))
            kernels.append((g / g.sum()).float())
        gh, gw = kernels
        pad = (gw.numel() // 2, gw.numel() // 2,
               gh.numel() // 2, gh.numel() // 2)
        xp = F.pad(x, pad, mode="reflect")
        c = x.shape[1]
        xp = F.conv2d(xp, gh.view(1, 1, -1, 1).expand(c, 1, -1, 1), groups=c)
        xp = F.conv2d(xp, gw.view(1, 1, 1, -1).expand(c, 1, 1, -1), groups=c)
        x = xp
    return F.interpolate(x, size=(out_size, out_size), mode="bicubic",
                         align_corners=True)


def test_clip_preprocess_antialias_downscale():
    """Real-inference shape: 576x1024 -> 224 with the antialias pre-blur
    (ADVICE r1: the no-blur path systematically shifted image conditioning).
    """
    x = np.random.default_rng(1).uniform(
        -1, 1, (1, 3, 576, 1024)).astype(np.float32)
    with torch.no_grad():
        ref = _kornia_resize_antialias_oracle(torch.tensor(x), 224).numpy()
    ours = np.asarray(clip_preprocess(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), out_size=224))
    from dynamicrafter_tpu.models.clip import CLIP_MEAN, CLIP_STD
    ours = (ours * CLIP_STD + CLIP_MEAN) * 2.0 - 1.0
    ours = np.transpose(ours, (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=0)
