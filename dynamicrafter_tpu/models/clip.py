"""OpenCLIP ViT-H/14 text + vision towers in Flax.

Consumes released open_clip-format weights via utils/weights.convert_clip_*.
Behavioral parity targets:
  * text tower, penultimate layer  lvdm/modules/encoders/condition.py:174-234
  * vision tower, all 257 tokens   lvdm/modules/encoders/condition.py:295-372
    (manual ViT forward that stops BEFORE ln_post/proj — returns the full
    patch-token sequence for the Resampler)

TPU notes: the patchify conv is a reshape+matmul (MXU-friendly); attention is
dense (L<=257) and runs through the shared ops.attention entry point.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamicrafter_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True  # drop the last resblock (layer="penultimate")


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    width: int = 1280
    heads: int = 16
    layers: int = 32
    patch_size: int = 14
    image_size: int = 224
    act: str = "gelu"  # "quick_gelu" for OpenAI clip ViT-L (ClipImageEmbedder)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    # "gelu" (open_clip ViT-H) or "quick_gelu" (OpenAI/HF CLIP ViT-L —
    # transformers CLIPTextConfig.hidden_act for openai/clip-vit-large-patch14)
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        d_head = self.width // self.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name,
                                       dtype=jnp.float32, param_dtype=jnp.float32)
        h = ln("ln_1")(x).astype(x.dtype)
        dense = lambda name, feats: nn.Dense(feats, name=name, dtype=x.dtype,
                                             param_dtype=jnp.float32)
        split = lambda t: t.reshape(*t.shape[:-1], self.heads, d_head)
        q = split(dense("q_proj", self.width)(h))
        k = split(dense("k_proj", self.width)(h))
        v = split(dense("v_proj", self.width)(h))
        attn = dot_product_attention(q, k, v, mask=mask, backend="xla")
        attn = attn.reshape(*attn.shape[:-2], self.width)
        x = x + dense("out_proj", self.width)(attn)
        h = ln("ln_2")(x).astype(x.dtype)
        h = dense("c_fc", self.width * 4)(h)
        if self.act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        x = x + dense("c_proj", self.width)(h)
        return x


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, 77) int32 -> (B, 77, width) penultimate features."""
        cfg = self.config
        tok_emb = self.param("token_embedding",
                             nn.initializers.normal(0.02),
                             (cfg.vocab_size, cfg.width))
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (cfg.context_length, cfg.width))
        x = (tok_emb[tokens] + pos_emb).astype(self.dtype)
        causal = jnp.tril(jnp.ones(
            (cfg.context_length, cfg.context_length), dtype=bool))
        n_blocks = cfg.layers - (1 if cfg.penultimate else 0)
        for i in range(n_blocks):
            x = ResidualAttentionBlock(cfg.width, cfg.heads,
                                       name=f"resblocks_{i}")(x, mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final", dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        return x


# CLIP image normalization constants (condition.py:319-320)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def _cubic_kernel(s: np.ndarray, a: float = -0.75) -> np.ndarray:
    s = np.abs(s)
    return np.where(
        s <= 1, ((a + 2) * s - (a + 3)) * s * s + 1,
        np.where(s < 2, a * (((s - 5) * s + 8) * s - 4), 0.0),
    )


def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Bicubic align_corners=True interpolation as a sparse (out,in) matrix.

    Matches torch/kornia F.interpolate(..., mode='bicubic',
    align_corners=True) used by the reference preprocess (condition.py:322).
    Static per (in,out) pair — becomes a constant matmul in the graph.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    base = np.floor(coords).astype(np.int64)
    frac = coords - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for off in (-1, 0, 1, 2):
        idx = np.clip(base + off, 0, in_size - 1)
        wgt = _cubic_kernel(off - frac)
        np.add.at(mat, (np.arange(out_size), idx), wgt)
    return mat.astype(np.float32)


def _gaussian_blur_matrix(size: int, sigma: float, ksize: int) -> np.ndarray:
    """Separable gaussian blur with reflect padding as a (size, size) matrix
    (kornia.filters.gaussian_blur2d, border_type='reflect')."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    mat = np.zeros((size, size), dtype=np.float64)
    half = ksize // 2
    for k, off in enumerate(range(-half, half + 1)):
        j = np.arange(size) + off
        # torch 'reflect' padding: edge not repeated
        j = np.where(j < 0, -j, j)
        j = np.where(j >= size, 2 * size - 2 - j, j)
        np.add.at(mat, (np.arange(size), j), g[k])
    return mat.astype(np.float32)


def _antialias_sigma_ks(factor: float):
    """kornia.geometry.resize antialias parameters for one axis:
    sigma = max((factor-1)/2, 0.001), ksize = max(4*sigma, 3) rounded to odd.
    kornia triggers the blur when max(factors) > 1 and then blurs BOTH axes
    (the non-downscaled axis gets the clamped near-identity sigma)."""
    sigma = max((factor - 1.0) / 2.0, 0.001)
    ks = int(max(2.0 * 2 * sigma, 3))
    if ks % 2 == 0:
        ks += 1
    return sigma, ks


def clip_preprocess(images: jax.Array, out_size: int = 224,
                    antialias: bool = True) -> jax.Array:
    """[-1,1] (B,H,W,3) -> CLIP-normalized (B,224,224,3).

    kornia.geometry.resize(..., 'bicubic', align_corners=True,
    antialias=True) + CLIP renormalization (condition.py:322-330). The
    antialias gaussian pre-blur (applied on downscale only) is linear, so it
    is folded into the constant per-axis resize matrices — the whole
    preprocess stays two matmuls.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    mh_np, mw_np = _resize_matrix(h, out_size), _resize_matrix(w, out_size)
    if antialias and max(h, w) > out_size:
        mh_np = mh_np @ _gaussian_blur_matrix(
            h, *_antialias_sigma_ks(h / out_size))
        mw_np = mw_np @ _gaussian_blur_matrix(
            w, *_antialias_sigma_ks(w / out_size))
    mh = jnp.asarray(mh_np)
    mw = jnp.asarray(mw_np)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    x = (x + 1.0) / 2.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return x


class CLIPVisionEncoder(nn.Module):
    """Returns ALL patch tokens (B, 1+grid^2, width) — no pooling, no ln_post
    (reference condition.py:342-372)."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.config
        b, hh, ww, c = pixels.shape
        p = cfg.patch_size
        grid = hh // p
        x = pixels.astype(self.dtype)
        # patchify as reshape + matmul: (B, gh, p, gw, p, C) -> (B, gh*gw, p*p*C)
        x = x.reshape(b, grid, p, grid, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, grid * grid, p * p * c)
        x = nn.Dense(cfg.width, use_bias=False, name="patch_embed",
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (grid * grid + 1, cfg.width))
        cls_tok = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width))
        x = jnp.concatenate([cls_tok, x], axis=1) + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", dtype=jnp.float32,
                         param_dtype=jnp.float32)(x).astype(self.dtype)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, act=cfg.act,
                                       name=f"resblocks_{i}")(x)
        return x
