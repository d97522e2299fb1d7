"""EXECUTED sp-sharded inference equality at mid-size shapes.

The flagship claim is frame-axis (sp) sharding of the inference step; the
collective plan is pinned by tests/test_sp_collectives.py and the full-size
graph is compile-asserted by DRYRUN_FLAGSHIP. This file closes the remaining
evidence gap: sp>1 sampling steps actually EXECUTE at T=16 on the full
flagship block topology (4 levels, attn at ds 1/2/4 — see
dynamicrafter_tpu.testing.midsize_unet_config) and match the single-device
result, covering

  * (1,8) and (2,4) meshes,
  * 2-pass and 3-pass (multi-cond) CFG, eta>0, ZTSNR + dynamic + guidance
    rescale (the 1024 recipe's sampler features),
  * non-square latents 16x40 whose deepest level (HW=2x5=10, not divisible
    by sp=8) exercises the constraint-drop/replicate path
    (parallel/sharding.py::constrain) INSIDE an otherwise sharded graph,
  * an odd-T case (T=6 on sp=8) where the T-axis constraint drops everywhere
    while temporal stages still shard HW.

Beyond reference (its multi-GPU inference is rank-sliced DP only,
scripts/evaluation/ddp_wrapper.py:29-47).
"""
import numpy as np
import pytest

import jax

from dynamicrafter_tpu.parallel.sharding import create_mesh
from dynamicrafter_tpu.testing import run_sp_inference

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
]

ATOL = 2e-4  # fp32; XLA:CPU sharded reductions may reorder sums


@pytest.fixture(scope="module")
def ref_b2_p2():
    return run_sp_inference(None, b=2, passes=2)


@pytest.fixture(scope="module")
def ref_b1_p3():
    return run_sp_inference(None, b=1, passes=3)


def test_sp8_t16_2pass_matches_single_device(ref_b2_p2):
    out = run_sp_inference(create_mesh(dp=1, sp=8), b=2, passes=2)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref_b2_p2, atol=ATOL, rtol=0)


def test_dp2_sp4_t16_2pass_matches_single_device(ref_b2_p2):
    out = run_sp_inference(create_mesh(dp=2, sp=4), b=2, passes=2)
    np.testing.assert_allclose(out, ref_b2_p2, atol=ATOL, rtol=0)


def test_sp8_t16_multicond_3pass_matches_single_device(ref_b1_p3):
    out = run_sp_inference(create_mesh(dp=1, sp=8), b=1, passes=3)
    np.testing.assert_allclose(out, ref_b1_p3, atol=ATOL, rtol=0)


def test_odd_t_constraint_drop_matches_single_device():
    """T=6 is not divisible by sp=8: every T-axis constraint drops to
    replicated while the temporal stages still shard HW=128 over sp — the
    mixed dropped/live regime of sharding.py:128-135."""
    from dynamicrafter_tpu.models.unet3d import UNetConfig

    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=32,
        attention_resolutions=(2, 1), num_res_blocks=1, channel_mult=(1, 2),
        num_head_channels=16, transformer_depth=1, context_dim=48,
        temporal_conv=True, temporal_attention=True, temporal_length=6,
        addition_attention=True, image_cross_attention=True,
        fs_condition=True)
    kw = dict(unet_cfg=cfg, b=1, t=6, h=8, w=16, passes=2)
    ref = run_sp_inference(None, **kw)
    out = run_sp_inference(create_mesh(dp=1, sp=8), **kw)
    np.testing.assert_allclose(out, ref, atol=ATOL, rtol=0)
