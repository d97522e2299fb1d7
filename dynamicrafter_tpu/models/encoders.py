"""Alternate conditioning encoders, TPU-native.

The reference registers several encoder classes beyond the OpenCLIP pair
that DynamiCrafter's released configs use (those two live in
``models/clip.py``).  This module rebuilds the rest so every
``target:`` name in the reference's encoder registry resolves to a native
implementation (reference: lvdm/modules/encoders/condition.py):

  * ``HFCLIPTextEncoder``  — FrozenCLIPEmbedder (condition.py:209-252):
    HF CLIP ViT-L/14 text tower (quick_gelu), ``layer`` = last | pooled |
    hidden (with ``layer_idx``).
  * ``T5Encoder``          — FrozenT5Embedder (condition.py:175-206):
    t5-v1_1 encoder stack — RMSNorm, shared relative-position bias
    (computed once as a static table), gated-GELU FFN.  The reference
    forwards ``input_ids`` only (no attention mask), so padded positions
    attend normally; we match that.
  * ``ClassEmbedder``      — condition.py:42-66, incl. the ucg
    "extra class" dropout and ``get_unconditional_conditioning``.
  * ``CLIPVisionPooled``   — the pooled image embedders
    (ClipImageEmbedder condition.py:255-291 / FrozenOpenCLIPImageEmbedder
    condition.py:352-420): full ViT incl. ln_post + projection on the CLS
    token, plus the per-sample ucg zeroing.
  * ``CLIPT5Encoder``      — FrozenCLIPT5Encoder (condition.py:375-389).
  * ``identity_encode``    — IdentityEncoder (condition.py:33-35).

TPU notes: all context lengths are static, so the T5 relative-position
bucket table is a compile-time numpy constant (one gather per forward);
attention here is dense (L <= 257) and MXU-bound.  Tokenization for the
HF-CLIP path reuses the native BPE tokenizer (HF's CLIPTokenizer and
open_clip share the vocab/merges but pad differently: EOT 49407 vs 0 —
pad positions are visible on the unmasked layer="last"/"hidden" outputs,
so the pipeline requests ``pad_id=eos`` for this role).  T5 sentencepiece
assets are external weights-class artifacts: ``T5Encoder`` consumes
token ids.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamicrafter_tpu.models.clip import (
    CLIPVisionConfig, CLIPVisionEncoder, ResidualAttentionBlock,
)


# ---------------------------------------------------------------------------
# FrozenCLIPEmbedder — HF CLIP text tower (ViT-L/14 text side)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HFCLIPTextConfig:
    """openai/clip-vit-large-patch14 text defaults (condition.py:216)."""
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    context_length: int = 77
    eos_token_id: int = 49407
    # reference LAYERS options (condition.py:211-215)
    layer: str = "last"          # last | pooled | hidden
    layer_idx: Optional[int] = None  # for layer="hidden"; may be negative


class HFCLIPTextEncoder(nn.Module):
    """HF ``CLIPTextModel`` forward in Flax (quick_gelu activation).

    layer="last":   (B, L, width) after final_layer_norm.
    layer="pooled": (B, 1, width) — last_hidden_state at the first EOS
                    position (HF pooler), matching ``outputs.pooler_output
                    [:, None, :]`` in condition.py:246.
    layer="hidden": (B, L, width) hidden_states[layer_idx] — *before* the
                    final layer norm (HF semantics).
    """

    config: HFCLIPTextConfig = HFCLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.config
        if cfg.layer == "hidden":
            assert cfg.layer_idx is not None and abs(cfg.layer_idx) <= cfg.layers
            # hidden_states has layers+1 entries (embeddings first)
            n_blocks = cfg.layer_idx % (cfg.layers + 1)
        else:
            n_blocks = cfg.layers
        tok_emb = self.param("token_embedding",
                             nn.initializers.normal(0.02),
                             (cfg.vocab_size, cfg.width))
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (cfg.context_length, cfg.width))
        x = (tok_emb[tokens] + pos_emb).astype(self.dtype)
        causal = jnp.tril(jnp.ones(
            (cfg.context_length, cfg.context_length), dtype=bool))
        for i in range(n_blocks):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, act="quick_gelu",
                                       name=f"resblocks_{i}")(x, mask=causal)
        if cfg.layer == "hidden":
            return x
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final", dtype=jnp.float32,
                         param_dtype=jnp.float32)(x).astype(self.dtype)
        if cfg.layer == "pooled":
            # first EOS position (HF CLIPTextModel pooler; argmax returns the
            # first True, and 0 when absent — same as torch)
            pos = jnp.argmax((tokens == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
            return jnp.take_along_axis(x, pos[:, None, None], axis=1)
        return x


# ---------------------------------------------------------------------------
# FrozenT5Embedder — t5-v1_1 encoder stack
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class T5Config:
    """google/t5-v1_1-large defaults (condition.py:178)."""
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6


def _t5_rel_buckets(qlen: int, klen: int, num_buckets: int,
                    max_distance: int) -> np.ndarray:
    """T5 bidirectional relative-position bucketing, as a static table.

    Mirrors the published bucketing formula (HF T5Attention
    _relative_position_bucket with bidirectional=True); context length is
    static so this is a compile-time constant.
    """
    rel = np.arange(klen)[None, :] - np.arange(qlen)[:, None]
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(n < max_exact, n, large)


class _T5RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


class _T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x: jax.Array, bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name, feats: nn.Dense(
            feats, use_bias=False, name=name, dtype=x.dtype,
            param_dtype=jnp.float32)
        h = _T5RMSNorm(cfg.eps, name="ln_attn")(x)
        split = lambda t: t.reshape(*t.shape[:-1], cfg.num_heads, cfg.d_kv)
        q = split(dense("q", inner)(h))
        k = split(dense("k", inner)(h))
        v = split(dense("v", inner)(h))
        # T5 attention is UNSCALED (the 1/sqrt(d) is folded into init)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v)
        x = x + dense("o", cfg.d_model)(attn.reshape(*attn.shape[:-2], inner))
        h = _T5RMSNorm(cfg.eps, name="ln_ff")(x)
        # gated-GELU: gelu_new(wi_0) * wi_1 (t5-v1_1 feed_forward_proj)
        g = jax.nn.gelu(dense("wi_0", cfg.d_ff)(h), approximate=True)
        x = x + dense("wo", cfg.d_model)(g * dense("wi_1", cfg.d_ff)(h))
        return x


class T5Encoder(nn.Module):
    """``T5EncoderModel.forward(input_ids)`` -> last_hidden_state.

    The reference never passes an attention mask (condition.py:196-201), so
    neither do we: all positions (incl. pads) participate.
    """

    config: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.config
        emb = self.param("token_embedding", nn.initializers.normal(1.0),
                         (cfg.vocab_size, cfg.d_model))
        x = emb[tokens].astype(self.dtype)
        rel = self.param("rel_bias", nn.initializers.normal(0.02),
                         (cfg.rel_buckets, cfg.num_heads))
        buckets = _t5_rel_buckets(tokens.shape[-1], tokens.shape[-1],
                                  cfg.rel_buckets, cfg.rel_max_distance)
        # (L, L, H) -> (1, H, L, L); computed by layer 0 and shared by all
        bias = jnp.transpose(rel[jnp.asarray(buckets)], (2, 0, 1))[None]
        bias = bias.astype(self.dtype)
        for i in range(cfg.num_layers):
            x = _T5Block(cfg, name=f"blocks_{i}")(x, bias)
        return _T5RMSNorm(cfg.eps, name="ln_final")(x)


# ---------------------------------------------------------------------------
# ClassEmbedder (condition.py:42-66)
# ---------------------------------------------------------------------------

class ClassEmbedder(nn.Module):
    embed_dim: int
    n_classes: int = 1000
    ucg_rate: float = 0.1

    @nn.compact
    def __call__(self, class_ids: jax.Array,
                 rng: Optional[jax.Array] = None,
                 disable_dropout: bool = False) -> jax.Array:
        """(B,) int class ids -> (B, 1, embed_dim) for crossattn.

        With ucg_rate > 0 and an rng, each id is replaced by the extra
        unconditional class (n_classes - 1) with prob ucg_rate
        (condition.py:55-58).
        """
        table = nn.Embed(self.n_classes, self.embed_dim,
                         name="embedding", param_dtype=jnp.float32)
        c = class_ids[:, None].astype(jnp.int32)
        if self.ucg_rate > 0.0 and not disable_dropout:
            if rng is None:
                raise ValueError("ClassEmbedder with ucg_rate > 0 needs rng "
                                 "(or disable_dropout=True)")
            keep = jax.random.bernoulli(rng, 1.0 - self.ucg_rate, c.shape)
            c = jnp.where(keep, c, self.n_classes - 1)
        return table(c)

    def unconditional_ids(self, bs: int) -> jax.Array:
        """condition.py:61-65 (the dict wrapper is the caller's concern)."""
        return jnp.full((bs,), self.n_classes - 1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Pooled CLIP image embedders (ClipImageEmbedder / FrozenOpenCLIPImageEmbedder)
# ---------------------------------------------------------------------------

class CLIPVisionPooled(nn.Module):
    """Full ViT image encode: ln_post(CLS) @ proj -> (B, output_dim).

    Covers both pooled reference embedders — OpenAI clip ViT
    (``ClipImageEmbedder``, quick_gelu) and open_clip ViT-H pooled
    (``FrozenOpenCLIPImageEmbedder``, gelu) — the tower body is shared with
    CLIPVisionEncoder (which the all-tokens V2 uses).  Callers run
    ``clip_preprocess`` first (same kornia-matched resize, clip.py).
    """

    config: CLIPVisionConfig = CLIPVisionConfig()
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array,
                 rng: Optional[jax.Array] = None,
                 ucg_rate: float = 0.0) -> jax.Array:
        x = CLIPVisionEncoder(self.config, dtype=self.dtype,
                              name="visual")(pixels)
        cls = nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=jnp.float32,
                           param_dtype=jnp.float32)(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.config.width, self.output_dim))
        out = (cls @ proj).astype(self.dtype)
        if ucg_rate > 0.0:
            if rng is None:
                raise ValueError("ucg_rate > 0 needs rng")
            # per-sample zeroing (condition.py:270-272, 287-289)
            keep = jax.random.bernoulli(rng, 1.0 - ucg_rate, (out.shape[0], 1))
            out = out * keep.astype(out.dtype)
        return out


# ---------------------------------------------------------------------------
# FrozenCLIPT5Encoder (condition.py:375-389) + IdentityEncoder
# ---------------------------------------------------------------------------

class CLIPT5Encoder(nn.Module):
    """Joint encode: returns (clip_z, t5_z) like the reference's list."""

    clip_config: HFCLIPTextConfig = HFCLIPTextConfig()
    t5_config: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_tokens: jax.Array,
                 t5_tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        clip_z = HFCLIPTextEncoder(self.clip_config, dtype=self.dtype,
                                   name="clip_encoder")(clip_tokens)
        t5_z = T5Encoder(self.t5_config, dtype=self.dtype,
                         name="t5_encoder")(t5_tokens)
        return clip_z, t5_z


def identity_encode(x: jax.Array) -> jax.Array:
    """IdentityEncoder.encode (condition.py:33-35)."""
    return x
