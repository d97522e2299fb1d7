"""Flax param-pytree -> PyTorch reference-format checkpoint exporter.

The exact inverse of utils/weights.py: walks a converted (or TPU-trained)
param tree and emits a flat ``{reference_key: np.ndarray}`` state dict whose
keys, ranks, and layouts match the released DynamiCrafter checkpoints
(reference scripts/evaluation/inference.py:34-59 load format), so weights
fine-tuned here can be loaded back by the reference torch code.

Rank subtleties the inverse must reproduce (torch module types):
  * Spatial/TemporalTransformer proj_in/proj_out are nn.Linear when the
    config sets use_linear (all shipped configs), else Conv2d 1x1 (spatial,
    lvdm/modules/attention.py:266-290) / Conv1d 1 (temporal, :332-362).
  * init_attn's TemporalTransformer is built WITHOUT use_linear
    (openaimodel3d.py:390-399), so its projections are always Conv1d.
  * VAE AttnBlock q/k/v/proj_out and nin_shortcut are Conv2d 1x1
    (ae_modules.py:26-78,151-210); temb_proj is Linear;
    quant_conv/post_quant_conv are Conv2d 1x1 (autoencoder.py).
  * CLIP attention q/k/v fold back into one in_proj_weight/in_proj_bias.

Keys the Flax side never holds (dropped as unused at conversion time) must
come from a donor checkpoint via ``base_sd``: the text tower's final
resblock + text_projection/logit_scale/attn_mask (penultimate output,
condition.py:209-221), the vision tower's ln_post/proj (stops before pool,
condition.py:342-372), VAE loss.* (GAN training head), and the DDPM
schedule buffers (betas/alphas_cumprod/..., ddpm3d.py:123-186). The
intended flow is fine-tune-from-released-ckpt -> export over that donor.

No torch import required: emits str -> np.ndarray; scripts/
export_checkpoint.py writes the file (torch.save when torch is present,
utils/torch_reader.save_torch_checkpoint otherwise).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _t(x):
    return np.ascontiguousarray(np.transpose(_np(x)))


def _conv5d_to_2d(w):  # (1,kh,kw,I,O) -> (O,I,kh,kw)
    return np.ascontiguousarray(np.transpose(_np(w)[0], (3, 2, 0, 1)))


def _conv4d_to_2d(w):  # (kh,kw,I,O) -> (O,I,kh,kw)
    return np.ascontiguousarray(np.transpose(_np(w), (3, 2, 0, 1)))


def _conv3d_inv(w):  # (kt,kh,kw,I,O) -> (O,I,kt,kh,kw)
    return np.ascontiguousarray(np.transpose(_np(w), (4, 3, 0, 1, 2)))


def _dense_to_proj(w, rank: int):
    """Dense kernel (I, O) -> Linear (O,I) / Conv1d (O,I,1) / Conv2d (O,I,1,1)."""
    w = _t(w)
    if rank == 2:
        return w
    if rank == 3:
        return w[:, :, None]
    if rank == 4:
        return w[:, :, None, None]
    raise ValueError(f"unexpected projection rank {rank}")


# ---------------------------------------------------------------------------
# Transformer blocks (inverse of weights._convert_transformer_rest)
# ---------------------------------------------------------------------------

def _export_transformer(tree: Mapping, out: Dict[str, np.ndarray], prefix: str,
                        proj_rank: int):
    for name, sub in tree.items():
        if name == "norm":  # GroupNorm
            out[prefix + "norm.weight"] = _np(sub["scale"])
            out[prefix + "norm.bias"] = _np(sub["bias"])
        elif name in ("proj_in", "proj_out"):
            out[prefix + name + ".weight"] = _dense_to_proj(sub["kernel"],
                                                            proj_rank)
            out[prefix + name + ".bias"] = _np(sub["bias"])
        elif name.startswith("transformer_blocks_"):
            n = name[len("transformer_blocks_"):]
            tb = f"{prefix}transformer_blocks.{n}."
            for inner, isub in sub.items():
                if inner in ("norm1", "norm2", "norm3"):
                    out[tb + inner + ".weight"] = _np(isub["scale"])
                    out[tb + inner + ".bias"] = _np(isub["bias"])
                elif inner in ("attn1", "attn2"):
                    at = tb + inner + "."
                    for k, v in isub.items():
                        if k == "alpha":
                            out[at + "alpha"] = _np(v)
                        elif k in ("relative_position_k", "relative_position_v"):
                            out[at + k + ".embeddings_table"] = \
                                _np(v["embeddings_table"])
                        elif k == "to_out":  # Sequential(Linear, Dropout)
                            out[at + "to_out.0.weight"] = _t(v["kernel"])
                            out[at + "to_out.0.bias"] = _np(v["bias"])
                        else:  # to_q / to_k / to_v / to_k_ip / to_v_ip
                            out[at + k + ".weight"] = _t(v["kernel"])
                elif inner == "ff":
                    # ff/proj_in -> ff.net.0.proj (GEGLU), ff/proj_out -> ff.net.2
                    out[tb + "ff.net.0.proj.weight"] = _t(isub["proj_in"]["kernel"])
                    out[tb + "ff.net.0.proj.bias"] = _np(isub["proj_in"]["bias"])
                    out[tb + "ff.net.2.weight"] = _t(isub["proj_out"]["kernel"])
                    out[tb + "ff.net.2.bias"] = _np(isub["proj_out"]["bias"])
                else:
                    raise KeyError(f"unhandled transformer entry: {name}.{inner}")
        else:
            raise KeyError(f"unhandled transformer entry: {name}")


# ---------------------------------------------------------------------------
# ResBlock (+TemporalConvBlock) (inverse of weights._convert_resblock_rest)
# ---------------------------------------------------------------------------

def _export_resblock(tree: Mapping, out: Dict[str, np.ndarray], prefix: str):
    for name, sub in tree.items():
        if name == "norm_in":
            out[prefix + "in_layers.0.weight"] = _np(sub["scale"])
            out[prefix + "in_layers.0.bias"] = _np(sub["bias"])
        elif name == "conv_in":
            out[prefix + "in_layers.2.weight"] = _conv5d_to_2d(sub["kernel"])
            out[prefix + "in_layers.2.bias"] = _np(sub["bias"])
        elif name == "emb_proj":
            out[prefix + "emb_layers.1.weight"] = _t(sub["kernel"])
            out[prefix + "emb_layers.1.bias"] = _np(sub["bias"])
        elif name == "norm_out":
            out[prefix + "out_layers.0.weight"] = _np(sub["scale"])
            out[prefix + "out_layers.0.bias"] = _np(sub["bias"])
        elif name == "conv_out":
            out[prefix + "out_layers.3.weight"] = _conv5d_to_2d(sub["kernel"])
            out[prefix + "out_layers.3.bias"] = _np(sub["bias"])
        elif name == "skip":
            out[prefix + "skip_connection.weight"] = _conv5d_to_2d(sub["kernel"])
            out[prefix + "skip_connection.bias"] = _np(sub["bias"])
        elif name == "tconv":
            # reference Sequential index: conv1 -> (GN, SiLU, Conv3d) = 2;
            # conv2..4 -> (GN, SiLU, Dropout, Conv3d) = 3 (openaimodel3d.py:255-267)
            for k, v in sub.items():
                if k.startswith("norm"):
                    n = k[-1]
                    out[f"{prefix}temopral_conv.conv{n}.0.weight"] = _np(v["scale"])
                    out[f"{prefix}temopral_conv.conv{n}.0.bias"] = _np(v["bias"])
                else:  # conv1..conv4
                    idx = 2 if k == "conv1" else 3
                    out[f"{prefix}temopral_conv.{k}.{idx}.weight"] = \
                        _conv3d_inv(v["kernel"])
                    out[f"{prefix}temopral_conv.{k}.{idx}.bias"] = _np(v["bias"])
        else:
            raise KeyError(f"unhandled resblock entry: {name}")


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _unet_block_kinds(unet_config) -> Dict[str, str]:
    """flax block name -> spec kind, from the same static topology that
    built the module tree (models/unet3d.py::_build_level_specs)."""
    from dynamicrafter_tpu.models.unet3d import _build_level_specs
    in_specs, mid_spec, out_specs = _build_level_specs(unet_config)
    kinds: Dict[str, str] = {}
    for i, block in enumerate(in_specs):
        for j, s in enumerate(block):
            kinds[f"input_blocks_{i}_{j}"] = s[0]
    for j, s in enumerate(mid_spec):
        kinds[f"middle_block_{j}"] = s[0]
    for i, block in enumerate(out_specs):
        for j, s in enumerate(block):
            kinds[f"output_blocks_{i}_{j}"] = s[0]
    return kinds


def export_unet(tree: Mapping, unet_config,
                use_linear: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_unet. Keys come back WITHOUT the
    'model.diffusion_model.' prefix (export_state_dict adds it).

    use_linear picks the proj_in/proj_out rank (reference attention.py:
    266-290): None reads unet_config.use_linear. init_attn is always
    Conv1d regardless (openaimodel3d.py:390-399 passes no use_linear).
    """
    if use_linear is None:
        use_linear = getattr(unet_config, "use_linear", True)
    spatial_rank = 2 if use_linear else 4
    temporal_rank = 2 if use_linear else 3
    kinds = _unet_block_kinds(unet_config)
    out: Dict[str, np.ndarray] = {}
    for name, sub in tree.items():
        if name in ("time_embed", "fps_embedding"):
            for dense, idx in (("dense0", 0), ("dense2", 2)):
                out[f"{name}.{idx}.weight"] = _t(sub[dense]["kernel"])
                out[f"{name}.{idx}.bias"] = _np(sub[dense]["bias"])
        elif name == "input_blocks_0_0":
            out["input_blocks.0.0.weight"] = _conv5d_to_2d(sub["kernel"])
            out["input_blocks.0.0.bias"] = _np(sub["bias"])
        elif name == "init_attn":
            _export_transformer(sub, out, "init_attn.0.", proj_rank=3)
        elif name == "out_norm":
            out["out.0.weight"] = _np(sub["scale"])
            out["out.0.bias"] = _np(sub["bias"])
        elif name == "out_conv":
            out["out.2.weight"] = _conv5d_to_2d(sub["kernel"])
            out["out.2.bias"] = _np(sub["bias"])
        else:
            kind = kinds.get(name)
            if kind is None:
                raise KeyError(f"unhandled UNet entry: {name}")
            # flax input_blocks_{i}_{j} -> reference input_blocks.{i}.{j}.
            head, i, j = name.rsplit("_", 2) if name.count("_") > 1 else (None,) * 3
            if name.startswith("middle_block_"):
                prefix = f"middle_block.{name.rsplit('_', 1)[1]}."
            else:
                prefix = f"{head}.{i}.{j}."
            if kind == "res":
                _export_resblock(sub, out, prefix)
            elif kind == "spatial":
                _export_transformer(sub, out, prefix, proj_rank=spatial_rank)
            elif kind == "temporal":
                _export_transformer(sub, out, prefix, proj_rank=temporal_rank)
            elif kind == "down":
                out[prefix + "op.weight"] = _conv5d_to_2d(sub["op"]["kernel"])
                out[prefix + "op.bias"] = _np(sub["op"]["bias"])
            elif kind == "up":
                out[prefix + "conv.weight"] = _conv5d_to_2d(sub["conv"]["kernel"])
                out[prefix + "conv.bias"] = _np(sub["conv"]["bias"])
            else:
                raise KeyError(f"unhandled UNet block kind {kind} for {name}")
    return out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

_VAE_CONV2D_1x1 = {"nin_shortcut", "q", "k", "v", "proj_out"}  # ae_modules.py


def _export_vae_module(tree: Mapping, out: Dict[str, np.ndarray], prefix: str):
    for name, sub in tree.items():
        if name in ("norm1", "norm2", "norm", "norm_out"):
            out[prefix + name + ".weight"] = _np(sub["scale"])
            out[prefix + name + ".bias"] = _np(sub["bias"])
        elif name in _VAE_CONV2D_1x1:
            out[prefix + name + ".weight"] = _dense_to_proj(sub["kernel"], 4)
            out[prefix + name + ".bias"] = _np(sub["bias"])
        elif name == "temb_proj":  # Linear (ae_modules ResnetBlock)
            out[prefix + name + ".weight"] = _t(sub["kernel"])
            out[prefix + name + ".bias"] = _np(sub["bias"])
        else:  # conv / conv1 / conv2 / conv_in / conv_out / conv_shortcut
            out[prefix + name + ".weight"] = _conv4d_to_2d(sub["kernel"])
            out[prefix + name + ".bias"] = _np(sub["bias"])


def export_vae(tree: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_vae ('first_stage_model.' prefix not
    included). VAE loss.* (GAN head) never reaches the Flax tree — supply
    via base_sd if the consumer needs it."""
    out: Dict[str, np.ndarray] = {}
    for name, sub in tree.items():
        if name in ("quant_conv", "post_quant_conv"):
            out[name + ".weight"] = _dense_to_proj(sub["kernel"], 4)
            out[name + ".bias"] = _np(sub["bias"])
            continue
        if name not in ("encoder", "decoder"):
            raise KeyError(f"unhandled VAE entry: {name}")
        for mod, msub in sub.items():
            if mod in ("conv_in", "conv_out", "norm_out"):
                _export_vae_module({mod: msub}, out, name + ".")
            elif mod.startswith("mid_"):
                # mid_block_1 / mid_attn_1 -> mid.block_1. / mid.attn_1.
                _export_vae_module(msub, out, f"{name}.mid.{mod[len('mid_'):]}.")
            else:
                # down_{i}_block_{j} / down_{i}_attn_{j} /
                # down_{i}_downsample / up_{i}_upsample
                parts = mod.split("_")
                tower, i = parts[0], parts[1]
                if parts[2] in ("block", "attn"):
                    ref = f"{name}.{tower}.{i}.{parts[2]}.{parts[3]}."
                else:  # downsample / upsample
                    ref = f"{name}.{tower}.{i}.{parts[2]}."
                _export_vae_module(msub, out, ref)
    return out


# ---------------------------------------------------------------------------
# CLIP towers (open_clip key format)
# ---------------------------------------------------------------------------

def _export_clip_resblock(tree: Mapping, out: Dict[str, np.ndarray], prefix: str):
    for name, sub in tree.items():
        if name in ("ln_1", "ln_2"):
            out[prefix + name + ".weight"] = _np(sub["scale"])
            out[prefix + name + ".bias"] = _np(sub["bias"])
        elif name in ("q_proj", "k_proj", "v_proj"):
            pass  # folded below
        elif name == "out_proj":
            out[prefix + "attn.out_proj.weight"] = _t(sub["kernel"])
            out[prefix + "attn.out_proj.bias"] = _np(sub["bias"])
        elif name in ("c_fc", "c_proj"):
            out[prefix + "mlp." + name + ".weight"] = _t(sub["kernel"])
            out[prefix + "mlp." + name + ".bias"] = _np(sub["bias"])
        else:
            raise KeyError(f"unhandled CLIP resblock entry: {name}")
    # q/k/v fold back into torch MultiheadAttention's packed in_proj
    out[prefix + "attn.in_proj_weight"] = np.concatenate(
        [_t(tree[n]["kernel"]) for n in ("q_proj", "k_proj", "v_proj")], axis=0)
    out[prefix + "attn.in_proj_bias"] = np.concatenate(
        [_np(tree[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")], axis=0)


def export_clip_text(tree: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_clip_text ('cond_stage_model.' prefix not
    included; keys start 'model.'). The dropped final resblock +
    text_projection/logit_scale/attn_mask must come from base_sd."""
    out: Dict[str, np.ndarray] = {}
    for name, sub in tree.items():
        if name == "token_embedding":
            out["model.token_embedding.weight"] = _np(sub)
        elif name == "positional_embedding":
            out["model.positional_embedding"] = _np(sub)
        elif name == "ln_final":
            out["model.ln_final.weight"] = _np(sub["scale"])
            out["model.ln_final.bias"] = _np(sub["bias"])
        elif name.startswith("resblocks_"):
            i = name[len("resblocks_"):]
            _export_clip_resblock(sub, out, f"model.transformer.resblocks.{i}.")
        else:
            raise KeyError(f"unhandled text-encoder entry: {name}")
    return out


def export_clip_vision(tree: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_clip_vision (keys start 'model.visual.').
    ln_post/proj (unused: the reference stops after the transformer,
    condition.py:342-372) must come from base_sd."""
    out: Dict[str, np.ndarray] = {}
    for name, sub in tree.items():
        if name == "class_embedding":
            out["model.visual.class_embedding"] = _np(sub)
        elif name == "positional_embedding":
            out["model.visual.positional_embedding"] = _np(sub)
        elif name == "patch_embed":
            # (p*p*3, W) -> Conv2d (W, 3, p, p), inverse of the converter's
            # transpose(2,3,1,0).reshape(-1, W)
            k = _np(sub["kernel"])
            width = k.shape[1]
            p = int(round((k.shape[0] // 3) ** 0.5))
            out["model.visual.conv1.weight"] = np.ascontiguousarray(
                k.reshape(p, p, 3, width).transpose(3, 2, 0, 1))
        elif name == "ln_pre":
            out["model.visual.ln_pre.weight"] = _np(sub["scale"])
            out["model.visual.ln_pre.bias"] = _np(sub["bias"])
        elif name.startswith("resblocks_"):
            i = name[len("resblocks_"):]
            _export_clip_resblock(
                sub, out, f"model.visual.transformer.resblocks.{i}.")
        else:
            raise KeyError(f"unhandled vision-encoder entry: {name}")
    return out


# ---------------------------------------------------------------------------
# Resampler / ImageProjModel
# ---------------------------------------------------------------------------

def export_resampler(tree: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_resampler ('image_proj_model.' prefix not
    included)."""
    out: Dict[str, np.ndarray] = {}
    for name, sub in tree.items():
        if name == "latents":
            out["latents"] = _np(sub)
        elif name in ("proj_in", "proj_out"):
            out[name + ".weight"] = _t(sub["kernel"])
            out[name + ".bias"] = _np(sub["bias"])
        elif name == "norm_out":
            out["norm_out.weight"] = _np(sub["scale"])
            out["norm_out.bias"] = _np(sub["bias"])
        elif name.endswith("_attn"):
            i = name[len("layers_"):-len("_attn")]
            base = f"layers.{i}.0."
            for k, v in sub.items():
                if k in ("norm1", "norm2"):
                    out[base + k + ".weight"] = _np(v["scale"])
                    out[base + k + ".bias"] = _np(v["bias"])
                else:  # to_q / to_kv / to_out (bias-free Linears)
                    out[base + k + ".weight"] = _t(v["kernel"])
        elif name.endswith("_ff"):
            i = name[len("layers_"):-len("_ff")]
            base = f"layers.{i}.1."
            out[base + "0.weight"] = _np(sub["norm"]["scale"])
            out[base + "0.bias"] = _np(sub["norm"]["bias"])
            out[base + "1.weight"] = _t(sub["fc1"]["kernel"])
            out[base + "3.weight"] = _t(sub["fc2"]["kernel"])
        elif name == "proj":  # ImageProjModel
            out["proj.weight"] = _t(sub["kernel"])
            out["proj.bias"] = _np(sub["bias"])
        elif name == "norm":  # ImageProjModel
            out["norm.weight"] = _np(sub["scale"])
            out["norm.bias"] = _np(sub["bias"])
        else:
            raise KeyError(f"unhandled resampler entry: {name}")
    return out


# ---------------------------------------------------------------------------
# Full checkpoint
# ---------------------------------------------------------------------------

_PREFIXES = {
    "unet": "model.diffusion_model.",
    "vae": "first_stage_model.",
    "clip_text": "cond_stage_model.",
    "clip_vision": "embedder.",
    "resampler": "image_proj_model.",
}


def export_state_dict(params: Mapping, unet_config=None,
                      use_linear: Optional[bool] = None,
                      base_sd: Optional[Mapping] = None) -> Dict[str, np.ndarray]:
    """Assemble a flat reference-format state dict from component trees.

    params: {"unet": ..., "vae": ..., "clip_text": ..., "clip_vision": ...,
    "resampler": ...} — any subset; missing components (and keys the Flax
    side never holds, see module docstring) fall through from base_sd.
    base_sd should already be normalized (weights.normalize_state_dict).
    """
    out: Dict[str, np.ndarray] = \
        {k: _np(v) for k, v in base_sd.items()} if base_sd else {}
    exporters = {
        "unet": (lambda t: export_unet(t, unet_config, use_linear)),
        "vae": export_vae,
        "clip_text": export_clip_text,
        "clip_vision": export_clip_vision,
        "resampler": export_resampler,
    }
    for comp, tree in params.items():
        fn = exporters.get(comp)
        if fn is None:
            continue  # e.g. schedule state kept elsewhere
        if comp == "unet" and unet_config is None:
            raise ValueError("export_state_dict needs unet_config to "
                             "reconstruct UNet block kinds")
        prefix = _PREFIXES[comp]
        for k, v in fn(tree).items():
            out[prefix + k] = v
    return out
