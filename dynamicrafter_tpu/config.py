"""Config system: YAML schema compatible with the reference configs.

The reference composes models by reflection: every `{target: pkg.Cls,
params: {...}}` node is instantiated (utils/utils.py:27-42, used from e.g.
configs/inference_256_v1.0.yaml). We keep the YAML schema verbatim but map
`target:` names — both the original `lvdm.*` names and our own — onto this
framework's config dataclasses, so reference config files load unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import yaml

# target-name suffix -> component role
_TARGET_ROLES = {
    "UNetModel": "unet",
    "AutoencoderKL": "vae",
    "IdentityFirstStage": "vae_identity",
    "FrozenOpenCLIPEmbedder": "clip_text",
    "FrozenOpenCLIPImageEmbedderV2": "clip_vision",
    # alternate encoders in the reference registry (models/encoders.py)
    "FrozenCLIPEmbedder": "clip_text_hf",
    "FrozenT5Embedder": "t5_text",
    "FrozenCLIPT5Encoder": "clip_t5_text",
    "ClipImageEmbedder": "clip_vision_pooled",
    "FrozenOpenCLIPImageEmbedder": "clip_vision_pooled",
    "ClassEmbedder": "class_embed",
    "IdentityEncoder": "identity",
    "Resampler": "resampler",
    "ImageProjModel": "image_proj",
    "LatentVisualDiffusion": "model",
    "LatentDiffusion": "model",
    "DDPM": "model",
}


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def target_role(target: str) -> Optional[str]:
    return _TARGET_ROLES.get(target.rsplit(".", 1)[-1])


class ModelConfig:
    """Parsed model section of a reference-style YAML config."""

    def __init__(self, model_node: Dict[str, Any]):
        if "model" in model_node:
            model_node = model_node["model"]
        assert target_role(model_node.get("target", "LatentVisualDiffusion")) == "model"
        p = dict(model_node.get("params", {}))
        self.params = p
        # model-node-level keys (siblings of params in the reference schema:
        # main/utils_train.py:138-160, main/trainer.py:88-93)
        self.pretrained_checkpoint = model_node.get("pretrained_checkpoint")

        # diffusion-level settings (ddpm3d.py:40-120, 464-548)
        self.timesteps = p.get("timesteps", 1000)
        self.beta_schedule = p.get("beta_schedule", "linear")
        self.linear_start = p.get("linear_start", 1e-4)
        self.linear_end = p.get("linear_end", 2e-2)
        self.cosine_s = p.get("cosine_s", 8e-3)
        self.parameterization = p.get("parameterization", "eps")
        self.rescale_betas_zero_snr = p.get("rescale_betas_zero_snr", False)
        self.use_dynamic_rescale = p.get("use_dynamic_rescale", False)
        self.base_scale = p.get("base_scale", 0.7)
        self.turning_step = p.get("turning_step", 400)
        self.scale_factor = p.get("scale_factor", 0.18215)
        self.uncond_type = p.get("uncond_type", "empty_seq")
        self.uncond_prob = p.get("uncond_prob", 0.05)
        self.interp_mode = p.get("interp_mode", False)
        self.fps_condition_type = p.get("fps_condition_type", "fs")
        self.perframe_ae = p.get("perframe_ae", False)
        self.rand_cond_frame = p.get("rand_cond_frame", False)
        self.conditioning_key = p.get("conditioning_key", "hybrid")
        self.loss_type = p.get("loss_type", "l2")

        self.unet = dict(p["unet_config"]["params"])
        self.vae = dict(p["first_stage_config"]["params"])
        # conditioning-stage targets: honor the reflection `target:` so a
        # config naming an alternate encoder gets the matching native tower
        # (models/encoders.py); shipped configs all use the OpenCLIP pair.
        def _role(node, default_target):
            target = node.get("target", default_target)
            role = target_role(target)
            if role is None:
                raise ValueError(
                    f"unrecognized conditioning target {target!r}; known "
                    f"targets: {sorted(_TARGET_ROLES)}")
            return target, role

        cond_node = p.get("cond_stage_config") or {}
        self.cond_stage_target, self.cond_stage_role = _role(
            cond_node,
            "lvdm.modules.encoders.condition.FrozenOpenCLIPEmbedder")
        self.cond_stage_params = dict(cond_node.get("params", {}) or {})
        img_node = p.get("img_cond_stage_config") or {}
        self.img_cond_stage_target, self.img_cond_stage_role = _role(
            img_node,
            "lvdm.modules.encoders.condition.FrozenOpenCLIPImageEmbedderV2")
        self.resampler = (dict(p["image_proj_stage_config"]["params"])
                          if "image_proj_stage_config" in p else None)
        # CLIP towers: size params are fixed by the released checkpoints
        # (ViT-H/14); allow explicit overrides for tests/small models.
        self.clip_text = dict(p.get("clip_text_config", {}).get("params", {}) or {})
        self.clip_vision = dict(p.get("clip_vision_config", {}).get("params", {}) or {})

    @classmethod
    def from_yaml(cls, path: str) -> "ModelConfig":
        return cls(load_yaml(path))
