"""Flax -> reference-torch checkpoint export (utils/export.py).

Round-trips real reference-module state dicts (the strongest available
oracle for key names, ranks, and layouts): sd -> weights.convert_* ->
export_* -> compare exactly, then strict-load the exported dict back into
the reference torch module. Covers both proj ranks (use_linear True/False,
lvdm/modules/attention.py:266-290) and the donor-passthrough merge."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

from dynamicrafter_tpu.models.unet3d import UNetConfig  # noqa: E402
from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG  # noqa: E402
from dynamicrafter_tpu.utils import weights as W  # noqa: E402
from dynamicrafter_tpu.utils.export import (  # noqa: E402
    export_clip_text,
    export_clip_vision,
    export_resampler,
    export_state_dict,
    export_unet,
    export_vae,
)
from test_full_checkpoint import build_fake_checkpoint  # noqa: E402

# keys conversion legitimately drops (see export.py module docstring):
# DDPM schedule buffers + anything a donor checkpoint must supply
_SCHEDULE_KEYS = {"betas", "alphas_cumprod", "scale_arr"}


def _np_sd(sd):
    return {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}


def _assert_same(exported, original, label):
    assert set(exported) == set(original), (
        f"{label}: key mismatch\n missing: {sorted(set(original) - set(exported))[:8]}"
        f"\n extra: {sorted(set(exported) - set(original))[:8]}")
    for k, v in original.items():
        assert exported[k].shape == v.shape, (label, k, exported[k].shape, v.shape)
        np.testing.assert_array_equal(exported[k], v, err_msg=f"{label}:{k}")


@requires_reference
def test_export_full_checkpoint_round_trip(tmp_path):
    """Every component: reference sd -> convert -> export == original, and
    the reassembled full state dict strict-loads into the torch modules."""
    _, ckpt_path, oracles = build_fake_checkpoint(tmp_path)
    sd = _np_sd(W.normalize_state_dict(torch.load(ckpt_path, map_location="cpu",
                                                  weights_only=True)))
    groups = W.split_reference_checkpoint(sd)
    ucfg = UNetConfig.from_dict(
        TINY_MODEL_CONFIG["model"]["params"]["unet_config"]["params"])

    params = {
        # reference UNetModel defaults use_linear=False -> Conv2d/Conv1d projs
        "unet": W.convert_unet(groups["unet"]),
        "vae": W.convert_vae(groups["vae"]),
        "clip_text": W.convert_clip_text(groups["clip_text"]),
        "clip_vision": W.convert_clip_vision(groups["clip_vision"]),
        "resampler": W.convert_resampler(groups["resampler"]),
    }
    _assert_same(export_unet(params["unet"], ucfg, use_linear=False),
                 groups["unet"], "unet")
    _assert_same(export_vae(params["vae"]), groups["vae"], "vae")
    # donor-only keys (unused penultimate-output pieces, see export.py):
    # the converter drops them, so the per-component inverse can't emit them
    text_donor = {"model.text_projection", "model.logit_scale",
                  "model.attn_mask"}
    vision_donor = {"model.visual.ln_post.weight", "model.visual.ln_post.bias",
                    "model.visual.proj", "mean", "std"}
    _assert_same(export_clip_text(params["clip_text"]),
                 {k: v for k, v in groups["clip_text"].items()
                  if k not in text_donor}, "clip_text")
    _assert_same(export_clip_vision(params["clip_vision"]),
                 {k: v for k, v in groups["clip_vision"].items()
                  if k not in vision_donor}, "clip_vision")
    _assert_same(export_resampler(params["resampler"]), groups["resampler"],
                 "resampler")

    # full assembly with donor passthrough for the schedule buffers
    full = export_state_dict(params, unet_config=ucfg, use_linear=False,
                             base_sd=sd)
    assert set(full) == set(sd)
    for k in _SCHEDULE_KEYS:
        np.testing.assert_array_equal(full[k], sd[k])

    # the ultimate consumer check: strict load back into the torch modules
    unet_sd = {k[len("model.diffusion_model."):]: torch.tensor(v)
               for k, v in full.items()
               if k.startswith("model.diffusion_model.")}
    oracles["unet"].load_state_dict(unet_sd, strict=True)
    res_sd = {k[len("image_proj_model."):]: torch.tensor(v)
              for k, v in full.items() if k.startswith("image_proj_model.")}
    oracles["resampler"].load_state_dict(res_sd, strict=True)


@requires_reference
def test_export_unet_use_linear_rank():
    """use_linear=True (all shipped configs) -> rank-2 Linear projections;
    init_attn stays Conv1d regardless (openaimodel3d.py:390-399)."""
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    up = dict(TINY_MODEL_CONFIG["model"]["params"]["unet_config"]["params"])
    unet = RefUNet(**up, use_linear=True).eval()
    sd = _np_sd(unet.state_dict())
    ucfg = UNetConfig.from_dict(up)
    exported = export_unet(W.convert_unet(sd), ucfg, use_linear=True)
    _assert_same(exported, sd, "unet_linear")
    assert exported["input_blocks.1.1.proj_in.weight"].ndim == 2
    assert exported["init_attn.0.proj_in.weight"].ndim == 3
    unet.load_state_dict({k: torch.tensor(v) for k, v in exported.items()},
                         strict=True)


@requires_reference
def test_export_checkpoint_cli_round_trip(tmp_path):
    """The fine-tune flow end to end: donor ckpt -> convert -> perturb the
    trainables -> Orbax save -> scripts/export_checkpoint.py --base donor ->
    reference-format ckpt that our loader reads back with the perturbation."""
    import subprocess
    import sys

    import jax

    from dynamicrafter_tpu.training.checkpoints import save_params

    cfg_path, ckpt_path, _ = build_fake_checkpoint(tmp_path)
    sd = _np_sd(W.normalize_state_dict(torch.load(ckpt_path, map_location="cpu",
                                                  weights_only=True)))
    groups = W.split_reference_checkpoint(sd)
    trainable = {"unet": W.convert_unet(groups["unet"]),
                 "resampler": W.convert_resampler(groups["resampler"])}
    # simulate fine-tuning: shift every trainable weight by +1
    trainable = jax.tree_util.tree_map(lambda x: x + 1.0, trainable)
    state_dir = tmp_path / "orbax_state"
    save_params(str(state_dir), {"params": trainable,
                                 "step": np.zeros((), np.int32)})

    out_path = tmp_path / "exported" / "model.ckpt"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_checkpoint.py"),
         "--config", cfg_path, "--params", str(state_dir),
         "--base", ckpt_path, "--out", str(out_path)],
        capture_output=True, text=True, timeout=300, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
    assert res.returncode == 0, res.stderr[-3000:]

    new_sd = _np_sd(W.normalize_state_dict(
        torch.load(out_path, map_location="cpu", weights_only=True)))
    assert set(new_sd) == set(sd)
    # trainables carry the fine-tune delta; frozen towers pass through
    np.testing.assert_allclose(
        new_sd["model.diffusion_model.out.2.bias"],
        sd["model.diffusion_model.out.2.bias"] + 1.0, atol=1e-6)
    np.testing.assert_array_equal(
        new_sd["first_stage_model.decoder.conv_out.weight"],
        sd["first_stage_model.decoder.conv_out.weight"])
    np.testing.assert_array_equal(new_sd["betas"], sd["betas"])


def test_export_merges_trainables_over_donor():
    """The fine-tune flow: trainable components exported OVER the donor
    checkpoint replace exactly those keys and keep everything else."""
    donor = {"model.diffusion_model.out.0.weight": np.zeros(4, np.float32),
             "model.diffusion_model.out.0.bias": np.zeros(4, np.float32),
             "cond_stage_model.model.text_projection": np.ones((8, 8), np.float32),
             "betas": np.full(10, 0.5, np.float32)}
    params = {"unet": {"out_norm": {"scale": np.arange(4, dtype=np.float32),
                                    "bias": np.ones(4, np.float32)}}}
    ucfg = UNetConfig.from_dict(
        TINY_MODEL_CONFIG["model"]["params"]["unet_config"]["params"])
    out = export_state_dict(params, unet_config=ucfg, base_sd=donor)
    np.testing.assert_array_equal(
        out["model.diffusion_model.out.0.weight"],
        np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(
        out["model.diffusion_model.out.0.bias"], np.ones(4, np.float32))
    np.testing.assert_array_equal(out["betas"], donor["betas"])
    np.testing.assert_array_equal(out["cond_stage_model.model.text_projection"],
                                  donor["cond_stage_model.model.text_projection"])
