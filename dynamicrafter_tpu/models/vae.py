"""SD-style KL autoencoder (first stage), channels-last for TPU.

Behavioral parity targets:
  * Encoder / Decoder        lvdm/modules/networks/ae_modules.py:364-578
  * ResnetBlock              ae_modules.py:151-210
  * AttnBlock (bottleneck)   ae_modules.py:26-78
  * asymmetric-pad Downsample ae_modules.py:90-109
  * AutoencoderKL            lvdm/models/autoencoder.py:13-199
  * DiagonalGaussianDistribution lvdm/distributions.py:24-65

TPU design notes:
  * (N, H, W, C) layout; 1x1 convs are Dense on the channel axis.
  * Per-frame encode/decode (reference `perframe_ae`, ddpm3d.py:629-663) is a
    lax.map over frames — bounds peak memory without a Python loop.
  * High-res decode additionally supports spatial tiling with overlap
    blending (decode_tiled) so 576x1024 fits comfortably in HBM.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamicrafter_tpu.ops.norms import GroupNorm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    double_z: bool = True
    z_channels: int = 4
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    embed_dim: int = 4

    @classmethod
    def from_dict(cls, d: dict) -> "VAEConfig":
        dd = dict(d.get("ddconfig", d))
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in dd.items() if k in known}
        if "embed_dim" in d:
            kwargs["embed_dim"] = d["embed_dim"]
        return cls(**kwargs)


def _conv(features, name, kernel=3, stride=1, pad=None, dtype=None):
    if pad is None:
        p = kernel // 2
        pad = [(p, p), (p, p)]
    return nn.Conv(features, kernel_size=(kernel, kernel), strides=(stride, stride),
                   padding=pad, name=name, dtype=dtype, param_dtype=jnp.float32)


class ResnetBlock(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out_ch = self.out_channels or self.in_channels
        h = jax.nn.silu(GroupNorm(32, epsilon=1e-6, name="norm1")(x))
        h = _conv(out_ch, "conv1", dtype=x.dtype)(h)
        h = jax.nn.silu(GroupNorm(32, epsilon=1e-6, name="norm2")(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv(out_ch, "conv2", dtype=x.dtype)(h)
        if self.in_channels != out_ch:
            x = nn.Dense(out_ch, name="nin_shortcut",
                         dtype=x.dtype, param_dtype=jnp.float32)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full spatial attention at the bottleneck (ae_modules.py:26-78)."""

    in_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        hid = GroupNorm(32, epsilon=1e-6, name="norm")(x)
        dense = lambda name: nn.Dense(c, name=name, dtype=x.dtype,
                                      param_dtype=jnp.float32)
        q = dense("q")(hid).reshape(n, h * w, c)
        k = dense("k")(hid).reshape(n, h * w, c)
        v = dense("v")(hid).reshape(n, h * w, c)
        # input-dtype logits (fp32 MXU accumulation), fp32 softmax fused
        sim = jnp.einsum("nqc,nkc->nqk", q, k,
                         preferred_element_type=x.dtype) * (c ** -0.5)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("nqk,nkc->nqc", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(n, h, w, c)
        return x + dense("proj_out")(out)


class Downsample(nn.Module):
    """Stride-2 conv with (0,1)x(0,1) asymmetric padding (ae_modules.py:90-109)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _conv(self.channels, "conv", stride=2,
                     pad=[(0, 1), (0, 1)], dtype=x.dtype)(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(self.channels, "conv", dtype=x.dtype)(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        x = x.astype(self.dtype)
        curr_res = cfg.resolution
        h = _conv(cfg.ch, "conv_in", dtype=self.dtype)(x)
        block_in = cfg.ch
        for i_level, mult in enumerate(cfg.ch_mult):
            block_out = cfg.ch * mult
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_in, block_out, cfg.dropout,
                                name=f"down_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_in, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = Downsample(block_in, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(block_in, block_in, cfg.dropout, name="mid_block_1")(
            h, deterministic=deterministic)
        h = AttnBlock(block_in, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, block_in, cfg.dropout, name="mid_block_2")(
            h, deterministic=deterministic)
        h = jax.nn.silu(GroupNorm(32, epsilon=1e-6, name="norm_out")(h))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _conv(out_ch, "conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    tanh_out: bool = False

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        z = z.astype(self.dtype)
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        h = _conv(block_in, "conv_in", dtype=self.dtype)(z)
        h = ResnetBlock(block_in, block_in, cfg.dropout, name="mid_block_1")(
            h, deterministic=deterministic)
        h = AttnBlock(block_in, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, block_in, cfg.dropout, name="mid_block_2")(
            h, deterministic=deterministic)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_in, block_out, cfg.dropout,
                                name=f"up_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_in, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_in, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = jax.nn.silu(GroupNorm(32, epsilon=1e-6, name="norm_out")(h))
        h = _conv(cfg.out_ch, "conv_out", dtype=self.dtype)(h)
        return jnp.tanh(h) if self.tanh_out else h


class DiagonalGaussian:
    """Posterior over latents (lvdm/distributions.py:24-65)."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, noise: jax.Array) -> jax.Array:
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AutoencoderKL(nn.Module):
    """Encoder + quant convs + Decoder (lvdm/models/autoencoder.py:13-127)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.config, dtype=self.dtype, name="decoder")
        zc = self.config.z_channels
        ed = self.config.embed_dim
        self.quant_conv = nn.Dense(2 * ed if self.config.double_z else ed,
                                   name="quant_conv", dtype=self.dtype,
                                   param_dtype=jnp.float32)
        self.post_quant_conv = nn.Dense(zc, name="post_quant_conv",
                                        dtype=self.dtype, param_dtype=jnp.float32)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, noise: Optional[jax.Array] = None):
        moments = self.encode_moments(x)
        post = DiagonalGaussian(moments)
        z = post.sample(noise) if noise is not None else post.mode()
        return self.decode(z), moments


class IdentityFirstStage(nn.Module):
    """Pass-through first stage for pixel-space diffusion configs
    (lvdm/models/autoencoder.py:202)."""

    def encode_moments(self, x: jax.Array) -> jax.Array:
        return jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)

    def decode(self, z: jax.Array) -> jax.Array:
        return z

    def __call__(self, x: jax.Array, noise=None):
        return x, self.encode_moments(x)


# ---------------------------------------------------------------------------
# Tiled decode for high-res (576x1024 on one chip)
# ---------------------------------------------------------------------------

def decode_tiled(
    decode_fn,
    z: jax.Array,
    tile: int = 48,
    overlap: int = 8,
    scale: int = 8,
) -> jax.Array:
    """Decode latents (N, h, w, zc) tile-by-tile with linear overlap blending.

    The reference avoids decoder OOM only by looping frame-by-frame on a
    40 GB A100 (ddpm3d.py:654-663); spatial tiling bounds memory at any
    resolution. Tiles are decoded in a scan; each output tile is feathered
    over the `overlap` band so seams vanish.
    """
    n, h, w, zc = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)
    # per-axis tile size: a dim smaller than `tile` gets one full-size tile
    # (guards e.g. 32x80 latents, where a square (tile, tile) window would
    # exceed the short axis)
    tile_h, tile_w = min(tile, h), min(tile, w)

    def _starts(dim, t):
        stride = max(t - overlap, 1)
        s = list(range(0, max(dim - t, 0) + 1, stride))
        if s[-1] + t < dim:
            s.append(dim - t)
        return s

    hs, ws = _starts(h, tile_h), _starts(w, tile_w)

    out_h, out_w = h * scale, w * scale
    out = jnp.zeros((n, out_h, out_w, 3), dtype=jnp.float32)
    weight = jnp.zeros((out_h, out_w, 1), dtype=jnp.float32)

    def _ramp(t, needs_blend):
        r = np.ones(t * scale, dtype=np.float32)
        band = overlap * scale
        if band > 0 and needs_blend:
            r[:band] = np.linspace(0, 1, band, endpoint=False) + 1.0 / band
            r[-band:] = r[:band][::-1]
        return r

    ramp_h = _ramp(tile_h, len(hs) > 1)
    ramp_w = _ramp(tile_w, len(ws) > 1)
    tile_w2d = jnp.asarray(ramp_h[:, None] * ramp_w[None, :])[..., None]

    for y in hs:
        for x0 in ws:
            zt = jax.lax.dynamic_slice(z, (0, y, x0, 0), (n, tile_h, tile_w, zc))
            dec = decode_fn(zt).astype(jnp.float32) * tile_w2d
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (0, y * scale, x0 * scale, 0),
                                      (n, tile_h * scale, tile_w * scale, 3)) + dec,
                (0, y * scale, x0 * scale, 0),
            )
            weight = jax.lax.dynamic_update_slice(
                weight,
                jax.lax.dynamic_slice(weight, (y * scale, x0 * scale, 0),
                                      (tile_h * scale, tile_w * scale, 1)) + tile_w2d,
                (y * scale, x0 * scale, 0),
            )
    return out / jnp.maximum(weight, 1e-8)
