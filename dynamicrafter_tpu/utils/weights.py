"""PyTorch checkpoint -> Flax param-pytree converter.

Understands the released DynamiCrafter checkpoints, covering all three source
formats (reference scripts/evaluation/inference.py:34-59,
main/utils_train.py:138-160):
  1. plain  {"state_dict": {...}}
  2. the 256-model key rename framestride_embed -> fps_embedding
  3. deepspeed "module."-prefixed keys (strip key[16:])

Layout conventions converted here:
  torch Linear  (O, I)          -> flax Dense kernel (I, O)
  torch Conv2d  (O, I, kh, kw)  -> UNet (1, kh, kw, I, O)   [5D per-frame conv]
                                -> VAE  (kh, kw, I, O)      [4D conv]
  torch Conv3d  (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
  torch Conv1d/2d 1x1 used as projections -> Dense kernel (I, O)
  torch GroupNorm/LayerNorm weight -> 'scale'

No torch import required to convert: accepts any mapping of str -> numpy.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.transpose(x))


def _conv2d_to_5d(w):  # (O,I,kh,kw) -> (1,kh,kw,I,O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))[None])


def _conv2d_to_4d(w):  # (O,I,kh,kw) -> (kh,kw,I,O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv3d(w):  # (O,I,kt,kh,kw) -> (kt,kh,kw,I,O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _proj_to_dense(w):
    """1x1 convs (rank 3/4) or Linear (rank 2) -> Dense kernel (I, O)."""
    if w.ndim == 2:
        return _t(w)
    if w.ndim == 3:  # Conv1d (O,I,1)
        return _t(w[:, :, 0])
    if w.ndim == 4:  # Conv2d (O,I,1,1)
        return _t(w[:, :, 0, 0])
    raise ValueError(f"unexpected projection weight rank {w.ndim}")


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


_DEEPSPEED_PREFIX = "_forward_module."  # 16 chars — reference strips key[16:]


def normalize_state_dict(sd: Mapping) -> Dict[str, np.ndarray]:
    """Apply the three source-format fixups to a raw checkpoint dict.

    Formats (reference scripts/evaluation/inference.py:36-59,
    scripts/evaluation/funcs.py:103-124):
      1. plain          {"state_dict": {plain keys}}
      2. 256-model      same, but framestride_embed -> fps_embedding rename
      3. deepspeed      {"module": {"_forward_module.<key>": tensor}, ...}
                        — weights nested under 'module', each key carrying the
                        16-char '_forward_module.' prefix (reference does
                        key[16:] unconditionally).
    """
    if "state_dict" in sd:
        sd = sd["state_dict"]
    elif "module" in sd and isinstance(sd["module"], Mapping):
        sd = {(k[len(_DEEPSPEED_PREFIX):] if k.startswith(_DEEPSPEED_PREFIX)
               else k): v
              for k, v in sd["module"].items()}
    out = dict(sd)
    # 256-model rename
    for k in list(out.keys()):
        if "framestride_embed" in k:
            out[k.replace("framestride_embed", "fps_embedding")] = out.pop(k)
    return out


# ---------------------------------------------------------------------------
# Transformer-block (spatial/temporal) inner keys
# ---------------------------------------------------------------------------

_LN_NAMES = {"norm1", "norm2", "norm3"}


def _convert_transformer_rest(rest: str, w, tree, base_path):
    """rest is everything after '<block>.' for a Spatial/TemporalTransformer."""
    parts = rest.split(".")
    leaf = parts[-1]
    if parts[0] == "norm":  # GroupNorm
        _set(tree, base_path + ("norm", "scale" if leaf == "weight" else "bias"), w)
        return
    if parts[0] in ("proj_in", "proj_out"):
        if leaf == "weight":
            _set(tree, base_path + (parts[0], "kernel"), _proj_to_dense(w))
        else:
            _set(tree, base_path + (parts[0], "bias"), w)
        return
    if parts[0] == "transformer_blocks":
        n = parts[1]
        tb = f"transformer_blocks_{n}"
        inner = parts[2:]
        if inner[0] in _LN_NAMES:
            _set(tree, base_path + (tb, inner[0], "scale" if leaf == "weight" else "bias"), w)
            return
        if inner[0] in ("attn1", "attn2"):
            attn = inner[0]
            if inner[1] == "alpha":
                _set(tree, base_path + (tb, attn, "alpha"), w)
                return
            if inner[1] in ("relative_position_k", "relative_position_v"):
                _set(tree, base_path + (tb, attn, inner[1], "embeddings_table"), w)
                return
            if inner[1] == "to_out":  # to_out.0 (Linear inside Sequential)
                _set(tree, base_path + (tb, attn, "to_out",
                                        "kernel" if leaf == "weight" else "bias"),
                     _t(w) if leaf == "weight" else w)
                return
            # to_q / to_k / to_v / to_k_ip / to_v_ip (no bias)
            _set(tree, base_path + (tb, attn, inner[1], "kernel"), _t(w))
            return
        if inner[0] == "ff":
            # ff.net.0.proj -> ff/proj_in ; ff.net.2 -> ff/proj_out
            if inner[1] == "net" and inner[2] == "0":
                _set(tree, base_path + (tb, "ff", "proj_in",
                                        "kernel" if leaf == "weight" else "bias"),
                     _t(w) if leaf == "weight" else w)
                return
            if inner[1] == "net" and inner[2] == "2":
                _set(tree, base_path + (tb, "ff", "proj_out",
                                        "kernel" if leaf == "weight" else "bias"),
                     _t(w) if leaf == "weight" else w)
                return
    raise KeyError(f"unhandled transformer key: {rest}")


def _convert_resblock_rest(rest: str, w, tree, base_path):
    parts = rest.split(".")
    leaf = parts[-1]
    is_weight = leaf == "weight"
    if parts[0] == "in_layers":
        if parts[1] == "0":
            _set(tree, base_path + ("norm_in", "scale" if is_weight else "bias"), w)
        else:  # in_layers.2 conv
            _set(tree, base_path + ("conv_in", "kernel" if is_weight else "bias"),
                 _conv2d_to_5d(w) if is_weight else w)
        return
    if parts[0] == "emb_layers":  # emb_layers.1 Linear
        _set(tree, base_path + ("emb_proj", "kernel" if is_weight else "bias"),
             _t(w) if is_weight else w)
        return
    if parts[0] == "out_layers":
        if parts[1] == "0":
            _set(tree, base_path + ("norm_out", "scale" if is_weight else "bias"), w)
        else:  # out_layers.3 conv
            _set(tree, base_path + ("conv_out", "kernel" if is_weight else "bias"),
                 _conv2d_to_5d(w) if is_weight else w)
        return
    if parts[0] == "skip_connection":
        _set(tree, base_path + ("skip", "kernel" if is_weight else "bias"),
             _conv2d_to_5d(w) if is_weight else w)
        return
    if parts[0] == "temopral_conv":  # [sic] reference typo, openaimodel3d.py:190
        convn = parts[1]  # conv1..conv4
        idx = parts[2]
        if idx == "0":  # GroupNorm
            _set(tree, base_path + ("tconv", "norm" + convn[-1],
                                    "scale" if is_weight else "bias"), w)
        else:  # Conv3d at index 2 (conv1) or 3 (conv2..4)
            _set(tree, base_path + ("tconv", convn, "kernel" if is_weight else "bias"),
                 _conv3d(w) if is_weight else w)
        return
    raise KeyError(f"unhandled resblock key: {rest}")


def _convert_block_rest(rest: str, w, tree, base_path):
    head = rest.split(".")[0]
    if head in ("in_layers", "emb_layers", "out_layers", "skip_connection",
                "temopral_conv"):
        _convert_resblock_rest(rest, w, tree, base_path)
    elif head in ("norm", "proj_in", "proj_out", "transformer_blocks"):
        _convert_transformer_rest(rest, w, tree, base_path)
    elif head == "op":  # Downsample conv
        leaf = rest.split(".")[-1]
        _set(tree, base_path + ("op", "kernel" if leaf == "weight" else "bias"),
             _conv2d_to_5d(w) if leaf == "weight" else w)
    elif head == "conv":  # Upsample conv
        leaf = rest.split(".")[-1]
        _set(tree, base_path + ("conv", "kernel" if leaf == "weight" else "bias"),
             _conv2d_to_5d(w) if leaf == "weight" else w)
    else:
        raise KeyError(f"unhandled block key: {rest}")


def convert_unet(sd: Mapping[str, np.ndarray]) -> Dict:
    """Convert reference UNet keys (already stripped of the
    'model.diffusion_model.' prefix) to a Flax param tree."""
    tree: Dict = {}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        leaf = parts[-1]
        is_weight = leaf == "weight"
        if parts[0] in ("time_embed", "fps_embedding"):
            dense = "dense0" if parts[1] == "0" else "dense2"
            _set(tree, (parts[0], dense, "kernel" if is_weight else "bias"),
                 _t(w) if is_weight else w)
        elif parts[0] == "input_blocks":
            i, j = parts[1], parts[2]
            rest = ".".join(parts[3:])
            if i == "0" and j == "0":  # first conv
                _set(tree, (f"input_blocks_0_0", "kernel" if is_weight else "bias"),
                     _conv2d_to_5d(w) if is_weight else w)
            else:
                _convert_block_rest(rest, w, tree, (f"input_blocks_{i}_{j}",))
        elif parts[0] == "init_attn":  # init_attn.0.<rest>
            rest = ".".join(parts[2:])
            _convert_transformer_rest(rest, w, tree, ("init_attn",))
        elif parts[0] == "middle_block":
            j = parts[1]
            rest = ".".join(parts[2:])
            _convert_block_rest(rest, w, tree, (f"middle_block_{j}",))
        elif parts[0] == "output_blocks":
            i, j = parts[1], parts[2]
            rest = ".".join(parts[3:])
            _convert_block_rest(rest, w, tree, (f"output_blocks_{i}_{j}",))
        elif parts[0] == "out":
            if parts[1] == "0":
                _set(tree, ("out_norm", "scale" if is_weight else "bias"), w)
            else:
                _set(tree, ("out_conv", "kernel" if is_weight else "bias"),
                     _conv2d_to_5d(w) if is_weight else w)
        else:
            raise KeyError(f"unhandled UNet key: {key}")
    return tree


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

_VAE_DENSE = {"nin_shortcut", "q", "k", "v", "proj_out", "temb_proj"}
_VAE_NORM = {"norm1", "norm2", "norm", "norm_out"}


def _convert_vae_module(rest_parts, w, tree, base_path):
    """Inner keys of a ResnetBlock / AttnBlock / sampler / plain conv."""
    leaf = rest_parts[-1]
    is_weight = leaf == "weight"
    name = rest_parts[0]
    if name in _VAE_NORM:
        _set(tree, base_path + (name, "scale" if is_weight else "bias"), w)
    elif name in _VAE_DENSE:
        _set(tree, base_path + (name, "kernel" if is_weight else "bias"),
             _proj_to_dense(w) if is_weight else w)
    else:  # convolutions (conv1, conv2, conv, conv_in, conv_out, conv_shortcut)
        _set(tree, base_path + (name, "kernel" if is_weight else "bias"),
             _conv2d_to_4d(w) if is_weight else w)


def convert_vae(sd: Mapping[str, np.ndarray]) -> Dict:
    """Convert AutoencoderKL keys (prefix 'first_stage_model.' stripped)."""
    tree: Dict = {}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        if parts[0] == "loss":
            continue  # GAN/perceptual loss weights — training-only, unused
        if parts[0] in ("quant_conv", "post_quant_conv"):
            leaf = parts[-1]
            _set(tree, (parts[0], "kernel" if leaf == "weight" else "bias"),
                 _proj_to_dense(w) if leaf == "weight" else w)
            continue
        tower = parts[0]  # encoder / decoder
        if tower not in ("encoder", "decoder"):
            raise KeyError(f"unhandled VAE key: {key}")
        inner = parts[1:]
        if inner[0] in ("conv_in", "conv_out", "norm_out"):
            _convert_vae_module(inner, w, tree, (tower,))
        elif inner[0] == "mid":
            # mid.block_1.<f> / mid.attn_1.<f>
            _convert_vae_module(inner[2:], w, tree, (tower, f"mid_{inner[1]}"))
        elif inner[0] in ("down", "up"):
            i = inner[1]
            sub = inner[2]
            if sub == "block":
                j = inner[3]
                _convert_vae_module(inner[4:], w, tree,
                                    (tower, f"{inner[0]}_{i}_block_{j}"))
            elif sub == "attn":
                j = inner[3]
                _convert_vae_module(inner[4:], w, tree,
                                    (tower, f"{inner[0]}_{i}_attn_{j}"))
            elif sub in ("downsample", "upsample"):
                _convert_vae_module(inner[3:], w, tree,
                                    (tower, f"{inner[0]}_{i}_{sub}"))
            else:
                raise KeyError(f"unhandled VAE key: {key}")
        else:
            raise KeyError(f"unhandled VAE key: {key}")
    return tree


# ---------------------------------------------------------------------------
# CLIP towers (open_clip checkpoint format)
# ---------------------------------------------------------------------------

def _convert_resblock_attn(inner, w, tree, base, width):
    """open_clip ResidualAttentionBlock inner keys."""
    leaf = inner[-1]
    is_weight = leaf.endswith("weight")
    if inner[0] in ("ln_1", "ln_2"):
        _set(tree, base + (inner[0], "scale" if is_weight else "bias"), w)
    elif inner[0] == "attn":
        if inner[1] == "in_proj_weight":
            qw, kw, vw = np.split(w, 3, axis=0)
            _set(tree, base + ("q_proj", "kernel"), _t(qw))
            _set(tree, base + ("k_proj", "kernel"), _t(kw))
            _set(tree, base + ("v_proj", "kernel"), _t(vw))
        elif inner[1] == "in_proj_bias":
            qb, kb, vb = np.split(w, 3, axis=0)
            _set(tree, base + ("q_proj", "bias"), qb)
            _set(tree, base + ("k_proj", "bias"), kb)
            _set(tree, base + ("v_proj", "bias"), vb)
        elif inner[1] == "out_proj":
            _set(tree, base + ("out_proj", "kernel" if is_weight else "bias"),
                 _t(w) if is_weight else w)
        else:
            raise KeyError(f"unhandled attn key: {'.'.join(inner)}")
    elif inner[0] == "mlp":
        name = inner[1]  # c_fc / c_proj
        _set(tree, base + (name, "kernel" if is_weight else "bias"),
             _t(w) if is_weight else w)
    else:
        raise KeyError(f"unhandled resblock key: {'.'.join(inner)}")


def convert_clip_text(sd: Mapping[str, np.ndarray], n_layers: int = 23) -> Dict:
    """Keys with 'cond_stage_model.' stripped (so starting 'model.').

    n_layers: number of transformer blocks kept (23 = penultimate for ViT-H).
    """
    tree: Dict = {}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        if parts[0] != "model":
            raise KeyError(f"unhandled text-encoder key: {key}")
        parts = parts[1:]
        if parts[0] in ("text_projection", "logit_scale", "attn_mask"):
            continue
        if parts[0] == "token_embedding":
            _set(tree, ("token_embedding",), w)
        elif parts[0] == "positional_embedding":
            _set(tree, ("positional_embedding",), w)
        elif parts[0] == "ln_final":
            _set(tree, ("ln_final", "scale" if parts[-1] == "weight" else "bias"), w)
        elif parts[0] == "transformer" and parts[1] == "resblocks":
            i = int(parts[2])
            if i >= n_layers:
                continue  # penultimate: final block unused
            _convert_resblock_attn(parts[3:], w, tree, (f"resblocks_{i}",),
                                   w.shape[-1])
        else:
            raise KeyError(f"unhandled text-encoder key: {key}")
    return tree


def convert_clip_vision(sd: Mapping[str, np.ndarray]) -> Dict:
    """Keys with 'embedder.' stripped (so starting 'model.visual.')."""
    tree: Dict = {}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        if parts[:2] != ["model", "visual"]:
            if parts[0] in ("mean", "std"):
                continue
            raise KeyError(f"unhandled vision-encoder key: {key}")
        parts = parts[2:]
        if parts[0] in ("ln_post", "proj"):
            continue  # unused: reference stops after the transformer
        if parts[0] == "class_embedding":
            _set(tree, ("class_embedding",), w)
        elif parts[0] == "positional_embedding":
            _set(tree, ("positional_embedding",), w)
        elif parts[0] == "conv1":  # (W, 3, p, p) no bias -> (p*p*3, W)
            pw = np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])
            _set(tree, ("patch_embed", "kernel"), np.ascontiguousarray(pw))
        elif parts[0] == "ln_pre":
            _set(tree, ("ln_pre", "scale" if parts[-1] == "weight" else "bias"), w)
        elif parts[0] == "transformer" and parts[1] == "resblocks":
            i = int(parts[2])
            _convert_resblock_attn(parts[3:], w, tree, (f"resblocks_{i}",),
                                   w.shape[-1])
        else:
            raise KeyError(f"unhandled vision-encoder key: {key}")
    return tree


def convert_clip_vision_pooled(sd: Mapping[str, np.ndarray]) -> Dict:
    """Pooled ViT image embedders (models/encoders.py::CLIPVisionPooled).

    Same 'model.visual.' layout as convert_clip_vision (OpenAI clip and
    open_clip ViTs share it) but keeps ln_post + proj for the pooled head.
    """
    body = {k: v for k, v in sd.items()
            if not k.startswith(("model.visual.ln_post", "model.visual.proj"))}
    tree: Dict = {"visual": convert_clip_vision(body)}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        if key.startswith("model.visual.ln_post"):
            _set(tree, ("ln_post",
                        "scale" if key.endswith("weight") else "bias"), w)
        elif key == "model.visual.proj":  # used as x @ proj -> no transpose
            _set(tree, ("proj",), w)
    return tree


def convert_hf_clip_text(sd: Mapping[str, np.ndarray]) -> Dict:
    """HF CLIPTextModel state dict (FrozenCLIPEmbedder's 'transformer.').

    Keys start 'text_model.' (models/encoders.py::HFCLIPTextEncoder).
    """
    tree: Dict = {}
    for key, w in sd.items():
        parts = key.split(".")
        if parts[0] != "text_model":
            if parts[-1] in ("position_ids",):
                continue
            raise KeyError(f"unhandled HF CLIP text key: {key}")
        parts = parts[1:]
        if parts[-1] == "position_ids":  # registered buffer in old versions
            continue
        w = np.asarray(w, dtype=np.float32)
        if parts[:2] == ["embeddings", "token_embedding"]:
            _set(tree, ("token_embedding",), w)
        elif parts[:2] == ["embeddings", "position_embedding"]:
            _set(tree, ("positional_embedding",), w)
        elif parts[0] == "final_layer_norm":
            _set(tree, ("ln_final",
                        "scale" if parts[-1] == "weight" else "bias"), w)
        elif parts[:2] == ["encoder", "layers"]:
            i = int(parts[2])
            base = (f"resblocks_{i}",)
            sub, leaf = parts[3], parts[-1]
            is_weight = leaf == "weight"
            if sub == "self_attn":
                name = parts[4]  # q_proj/k_proj/v_proj/out_proj
                _set(tree, base + (name, "kernel" if is_weight else "bias"),
                     _t(w) if is_weight else w)
            elif sub in ("layer_norm1", "layer_norm2"):
                name = "ln_1" if sub == "layer_norm1" else "ln_2"
                _set(tree, base + (name, "scale" if is_weight else "bias"), w)
            elif sub == "mlp":
                name = "c_fc" if parts[4] == "fc1" else "c_proj"
                _set(tree, base + (name, "kernel" if is_weight else "bias"),
                     _t(w) if is_weight else w)
            else:
                raise KeyError(f"unhandled HF CLIP text key: {key}")
        else:
            raise KeyError(f"unhandled HF CLIP text key: {key}")
    return tree


def convert_t5_encoder(sd: Mapping[str, np.ndarray]) -> Dict:
    """HF T5EncoderModel state dict (models/encoders.py::T5Encoder).

    All Linears are bias-free; 'shared' and 'encoder.embed_tokens' are the
    same tensor (either populates token_embedding).
    """
    tree: Dict = {}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        if key in ("shared.weight", "encoder.embed_tokens.weight"):
            _set(tree, ("token_embedding",), w)
        elif key == "encoder.final_layer_norm.weight":
            _set(tree, ("ln_final", "scale"), w)
        elif parts[:2] == ["encoder", "block"]:
            i = int(parts[2])
            base = (f"blocks_{i}",)
            # encoder.block.i.layer.{0,1}.<module>...
            which, mod = parts[4], parts[5]
            if mod == "SelfAttention":
                name = parts[6]
                if name == "relative_attention_bias":
                    _set(tree, ("rel_bias",), w)  # shared, lives on layer 0
                else:  # q/k/v/o, weight only
                    _set(tree, base + (name, "kernel"), _t(w))
            elif mod == "DenseReluDense":
                _set(tree, base + (parts[6], "kernel"), _t(w))
            elif mod == "layer_norm":
                name = "ln_attn" if which == "0" else "ln_ff"
                _set(tree, base + (name, "scale"), w)
            else:
                raise KeyError(f"unhandled T5 key: {key}")
        else:
            raise KeyError(f"unhandled T5 key: {key}")
    return tree


def convert_resampler(sd: Mapping[str, np.ndarray]) -> Dict:
    """Keys with 'image_proj_model.' stripped."""
    tree: Dict = {}
    for key, w in sd.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        leaf = parts[-1]
        is_weight = leaf == "weight"
        if parts[0] == "latents":
            _set(tree, ("latents",), w)
        elif parts[0] in ("proj_in", "proj_out"):
            _set(tree, (parts[0], "kernel" if is_weight else "bias"),
                 _t(w) if is_weight else w)
        elif parts[0] == "norm_out":
            _set(tree, ("norm_out", "scale" if is_weight else "bias"), w)
        elif parts[0] == "layers":
            i = parts[1]
            if parts[2] == "0":  # PerceiverAttention
                base = (f"layers_{i}_attn",)
                name = parts[3]
                if name in ("norm1", "norm2"):
                    _set(tree, base + (name, "scale" if is_weight else "bias"), w)
                else:  # to_q/to_kv/to_out, no bias
                    _set(tree, base + (name, "kernel"), _t(w))
            else:  # FeedForward Sequential: 0=LN, 1=Linear, 3=Linear
                base = (f"layers_{i}_ff",)
                idx = parts[3]
                if idx == "0":
                    _set(tree, base + ("norm", "scale" if is_weight else "bias"), w)
                elif idx == "1":
                    _set(tree, base + ("fc1", "kernel"), _t(w))
                elif idx == "3":
                    _set(tree, base + ("fc2", "kernel"), _t(w))
                else:
                    raise KeyError(f"unhandled resampler key: {key}")
        elif parts[0] in ("proj", "norm"):  # ImageProjModel
            _set(tree, (parts[0],
                        ("kernel" if is_weight else "bias") if parts[0] == "proj"
                        else ("scale" if is_weight else "bias")),
                 _t(w) if (is_weight and parts[0] == "proj") else w)
        else:
            raise KeyError(f"unhandled resampler key: {key}")
    return tree


# names of modules whose params stay fp32 (the fp32-island norms)
_NORM_MODULE_MARKERS = ("norm", "ln_")


def cast_params(tree, dtype, keep_norms_fp32: bool = True):
    """Cast a param pytree for storage (bf16 halves HBM + per-step weight
    bandwidth). Norm scales/biases stay fp32 to preserve the fp32-island
    semantics (lvdm/basics.py:76-87)."""
    import jax

    def walk(node, in_norm):
        if isinstance(node, dict):
            return {k: walk(v, in_norm or any(m in k.lower()
                                              for m in _NORM_MODULE_MARKERS))
                    for k, v in node.items()}
        if keep_norms_fp32 and in_norm:
            return node
        if hasattr(node, "dtype") and node.dtype in (np.float32, np.float64):
            return node.astype(dtype)
        return node

    return walk(tree, False)


def split_reference_checkpoint(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a full LatentVisualDiffusion state dict into component dicts."""
    groups = {
        "unet": "model.diffusion_model.",
        "vae": "first_stage_model.",
        "clip_text": "cond_stage_model.",
        "clip_vision": "embedder.",
        "resampler": "image_proj_model.",
    }
    out: Dict[str, Dict[str, np.ndarray]] = {k: {} for k in groups}
    out["other"] = {}
    for key, w in sd.items():
        for name, prefix in groups.items():
            if key.startswith(prefix):
                out[name][key[len(prefix):]] = w
                break
        else:
            out["other"][key] = w
    return out
