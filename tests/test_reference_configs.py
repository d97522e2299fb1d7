"""The reference's own YAML config files must load unchanged (public-surface
compatibility: lvdm.* target names, same schema)."""
import os

import pytest

from conftest import REFERENCE_ROOT, requires_reference

from dynamicrafter_tpu.config import ModelConfig
from dynamicrafter_tpu.models.unet3d import UNetConfig
from dynamicrafter_tpu.models.vae import VAEConfig
from dynamicrafter_tpu.models.resampler import ResamplerConfig


@requires_reference
@pytest.mark.parametrize("name,expect", [
    ("inference_256_v1.0.yaml",
     dict(param="eps", ztsnr=False, dyn=False, fs_default=3, learnable=True)),
    ("inference_512_v1.0.yaml",
     dict(param="v", ztsnr=True, dyn=True, fs_default=24, learnable=False)),
    ("inference_1024_v1.0.yaml",
     dict(param="v", ztsnr=True, dyn=True, fs_default=10, learnable=False)),
])
def test_reference_inference_configs_load(name, expect):
    path = os.path.join(REFERENCE_ROOT, "configs", name)
    mc = ModelConfig.from_yaml(path)
    assert mc.parameterization == expect["param"]
    assert mc.rescale_betas_zero_snr == expect["ztsnr"]
    assert mc.use_dynamic_rescale == expect["dyn"]

    ucfg = UNetConfig.from_dict(mc.unet)
    assert ucfg.model_channels == 320
    assert ucfg.channel_mult == (1, 2, 4, 4)
    assert ucfg.temporal_length == 16
    assert ucfg.default_fs == expect["fs_default"]
    assert ucfg.image_cross_attention
    assert ucfg.image_cross_attention_scale_learnable == expect["learnable"]
    assert ucfg.fs_condition

    vcfg = VAEConfig.from_dict(mc.vae)
    assert vcfg.ch == 128 and vcfg.ch_mult == (1, 2, 4, 4)
    assert vcfg.z_channels == 4 and vcfg.embed_dim == 4

    rcfg = ResamplerConfig.from_dict(mc.resampler)
    assert rcfg.num_queries == 16 and rcfg.video_length == 16
    assert rcfg.embedding_dim == 1280 and rcfg.output_dim == 1024


@requires_reference
def test_reference_training_config_loads():
    path = os.path.join(REFERENCE_ROOT, "configs",
                        "training_512_v1.0", "config.yaml")
    mc = ModelConfig.from_yaml(path)
    assert mc.parameterization == "v"
    assert mc.uncond_prob == 0.05
    assert mc.rand_cond_frame
    assert mc.perframe_ae
    ucfg = UNetConfig.from_dict(mc.unet)
    assert ucfg.use_checkpoint
    assert mc.params.get("image_proj_model_trainable", False)
