"""Perceiver Resampler: CLIP patch tokens -> per-frame image context tokens.

Behavioral parity target: lvdm/modules/encoders/resampler.py:26-145.
With video_length=16 and num_queries=16 the learned latents are 256 queries
(16 per output frame); each PerceiverAttention layer attends over
[patch_tokens ; latents] with the symmetric 1/sqrt(sqrt(d)) scaling and fp32
softmax (resampler.py:86-88).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = 16

    @classmethod
    def from_dict(cls, d: dict) -> "ResamplerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        """x: (B, N1, D) image features; latents: (B, N2, D)."""
        inner = self.dim_head * self.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name,
                                       dtype=jnp.float32, param_dtype=jnp.float32)
        x = ln("norm1")(x).astype(latents.dtype)
        lat = ln("norm2")(latents).astype(latents.dtype)
        b, l, _ = lat.shape

        dense = lambda name, feats: nn.Dense(feats, use_bias=False, name=name,
                                             dtype=lat.dtype, param_dtype=jnp.float32)
        q = dense("to_q", inner)(lat)
        kv_in = jnp.concatenate([x, lat], axis=-2)
        kv = dense("to_kv", inner * 2)(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        split = lambda t: t.reshape(*t.shape[:-1], self.heads, self.dim_head) \
            .swapaxes(-3, -2)
        q, k, v = split(q), split(k), split(v)

        # symmetric scaling, fp32 softmax (resampler.py:86-88)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(self.dim_head)))
        w = jnp.einsum("bhqd,bhkd->bhqk",
                       (q * scale).astype(jnp.float32),
                       (k * scale).astype(jnp.float32))
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.swapaxes(-3, -2).reshape(b, l, inner)
        return dense("to_out", self.dim)(out)


class ResamplerFF(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=jnp.float32,
                         param_dtype=jnp.float32)(x).astype(x.dtype)
        h = nn.Dense(self.dim * self.mult, use_bias=False, name="fc1",
                     dtype=x.dtype, param_dtype=jnp.float32)(h)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, use_bias=False, name="fc2",
                        dtype=x.dtype, param_dtype=jnp.float32)(h)


class Resampler(nn.Module):
    config: ResamplerConfig = ResamplerConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, N, embedding_dim) CLIP tokens -> (B, T*Q, output_dim)."""
        cfg = self.config
        nq = cfg.num_queries * (cfg.video_length or 1)
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / (cfg.dim ** 0.5),
            (1, nq, cfg.dim),
        )
        x = x.astype(self.dtype)
        lat = jnp.broadcast_to(latents.astype(self.dtype),
                               (x.shape[0], nq, cfg.dim))
        x = nn.Dense(cfg.dim, name="proj_in", dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        for i in range(cfg.depth):
            lat = PerceiverAttention(cfg.dim, cfg.dim_head, cfg.heads,
                                     name=f"layers_{i}_attn")(x, lat) + lat
            lat = ResamplerFF(cfg.dim, cfg.ff_mult, name=f"layers_{i}_ff")(lat) + lat
        lat = nn.Dense(cfg.output_dim, name="proj_out", dtype=self.dtype,
                       param_dtype=jnp.float32)(lat)
        return nn.LayerNorm(epsilon=1e-5, name="norm_out", dtype=jnp.float32,
                            param_dtype=jnp.float32)(lat).astype(self.dtype)


class ImageProjModel(nn.Module):
    """Simple linear alternative to the Resampler (resampler.py:9-23);
    present for config compatibility, unused by shipped configs."""

    cross_attention_dim: int = 1024
    clip_embeddings_dim: int = 1024
    clip_extra_context_tokens: int = 4

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        b = image_embeds.shape[0]
        x = nn.Dense(self.clip_extra_context_tokens * self.cross_attention_dim,
                     name="proj", param_dtype=jnp.float32)(image_embeds)
        x = x.reshape(b, -1, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, name="norm", dtype=jnp.float32,
                            param_dtype=jnp.float32)(x)
