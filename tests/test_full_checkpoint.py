"""Integration: a full reference-format torch checkpoint (all 5 components,
tiny sizes) -> from_checkpoint -> component parity + e2e sample.

Covers split_reference_checkpoint, normalize_state_dict (plain + deepspeed
'module.'-prefixed + framestride_embed rename) and all five converters in one
file-level round trip.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline  # noqa: E402
from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG  # noqa: E402
from test_conditioning_parity import (  # noqa: E402
    _OracleTextTower, _OracleVisionTower, randomize_,
)


def build_fake_checkpoint(tmp_path, deepspeed=False):
    from lvdm.modules.networks.ae_modules import Decoder as RefDecoder
    from lvdm.modules.networks.ae_modules import Encoder as RefEncoder
    from lvdm.modules.encoders.resampler import Resampler as RefResampler
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    p = TINY_MODEL_CONFIG["model"]["params"]
    up = dict(p["unet_config"]["params"])

    unet = randomize_(RefUNet(**up).eval(), seed=0)
    vcfg = p["first_stage_config"]["params"]["ddconfig"]
    enc = randomize_(RefEncoder(**vcfg).eval(), seed=1)
    dec = randomize_(RefDecoder(**vcfg).eval(), seed=2)
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    tc = p["clip_text_config"]["params"]
    text = randomize_(_OracleTextTower(tc["vocab_size"], tc["width"],
                                       tc["heads"], tc["layers"],
                                       tc["context_length"]).eval(), seed=3,
                      std=0.02)
    vc = p["clip_vision_config"]["params"]
    vision = randomize_(_OracleVisionTower(vc["width"], vc["heads"],
                                           vc["layers"], vc["patch_size"],
                                           vc["image_size"]).eval(), seed=4,
                        std=0.05)
    rp = p["image_proj_stage_config"]["params"]
    resampler = randomize_(RefResampler(**rp).eval(), seed=5)

    sd = {}
    sd.update({f"model.diffusion_model.{k}": v
               for k, v in unet.state_dict().items()})
    sd.update({f"first_stage_model.encoder.{k}": v
               for k, v in enc.state_dict().items()})
    sd.update({f"first_stage_model.decoder.{k}": v
               for k, v in dec.state_dict().items()})
    sd.update({f"first_stage_model.quant_conv.{k}": v
               for k, v in quant.state_dict().items()})
    sd.update({f"first_stage_model.post_quant_conv.{k}": v
               for k, v in post.state_dict().items()})
    sd.update({f"cond_stage_model.model.{k}": v
               for k, v in text.state_dict().items()})
    sd.update({f"embedder.model.visual.{k}": v
               for k, v in vision.state_dict().items()})
    sd.update({f"image_proj_model.{k}": v
               for k, v in resampler.state_dict().items()})
    # schedule buffers the loader must tolerate
    sd["betas"] = torch.zeros(1000)
    sd["alphas_cumprod"] = torch.zeros(1000)
    sd["scale_arr"] = torch.zeros(1400)

    ckpt_path = tmp_path / ("model_ds.ckpt" if deepspeed else "model.ckpt")
    if deepspeed:
        # real deepspeed format (reference funcs.py:120-124): tensors nested
        # under 'module' with a 16-char '_forward_module.' prefix; NO
        # top-level 'state_dict'
        ds = {"module": {f"_forward_module.{k}": v for k, v in sd.items()},
              "optimizer": {}, "global_step": 0}
        torch.save(ds, str(ckpt_path))
    else:
        torch.save({"state_dict": sd}, str(ckpt_path))

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(TINY_MODEL_CONFIG))
    return str(cfg_path), str(ckpt_path), dict(
        unet=unet, text=text, vision=vision, resampler=resampler)


@pytest.mark.slow
@requires_reference
def test_from_checkpoint_component_parity(tmp_path):
    cfg_path, ckpt_path, oracles = build_fake_checkpoint(tmp_path)
    pipe = DynamiCrafterPipeline.from_checkpoint(cfg_path, ckpt_path, allow_hash_tokenizer=True)
    assert set(pipe.params) == {"unet", "vae", "clip_text", "clip_vision",
                                "resampler"}

    # text tower parity through the loaded params
    tokens = np.random.default_rng(0).integers(
        0, 100, (2, 77)).astype(np.int32)
    with torch.no_grad():
        ref_txt = oracles["text"](torch.tensor(tokens.astype(np.int64))).numpy()
    ours_txt = np.asarray(pipe._text_fn(pipe.params["clip_text"],
                                        jnp.asarray(tokens)))
    np.testing.assert_allclose(ours_txt, ref_txt, atol=5e-4, rtol=0)

    # image-context path: vision tower + resampler chained
    img = np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)) \
        .astype(np.float32)
    ctx = np.asarray(pipe.embed_image_ctx(jnp.asarray(img)))
    assert ctx.shape == (1, 4, 4, 48)
    with torch.no_grad():
        ti = torch.tensor(np.transpose(img, (0, 3, 1, 2)))
        ti = (ti + 1) / 2
        from dynamicrafter_tpu.models.clip import CLIP_MEAN, CLIP_STD
        ti = (ti - torch.tensor(CLIP_MEAN)[:, None, None]) \
            / torch.tensor(CLIP_STD)[:, None, None]
        tok = oracles["vision"](ti)
        ref_ctx = oracles["resampler"](tok).numpy().reshape(1, 4, 4, 48)
    np.testing.assert_allclose(ctx, ref_ctx, atol=1e-3, rtol=0)

    # e2e sample runs with converted weights
    vids = np.random.default_rng(2).uniform(
        -1, 1, (1, 4, 16, 16, 3)).astype(np.float32)
    out = pipe.sample(["a sailing boat"], vids, steps=2, cfg_scale=2.0,
                      timestep_spacing="uniform_trailing", seed=0)
    assert out.videos.shape == (1, 1, 4, 16, 16, 3)
    assert np.all(np.isfinite(out.videos))


@requires_reference
def test_from_checkpoint_deepspeed_format(tmp_path):
    cfg_path, ckpt_path, _ = build_fake_checkpoint(tmp_path, deepspeed=True)
    pipe = DynamiCrafterPipeline.from_checkpoint(cfg_path, ckpt_path, allow_hash_tokenizer=True)
    assert "unet" in pipe.params and "vae" in pipe.params
