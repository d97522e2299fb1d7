"""Pin the sp-sharded UNet's collective plan (docs/DESIGN.md mesh table).

The design: spatial stages carry T on 'sp', temporal stages carry HW on
'sp'. The compiled HLO must therefore contain exactly

  * 2 all-to-alls per TemporalTransformer (the constrained transposes into
    and out of the (B, HW, T, C) layout),
  * 2 collective-permutes per temporal conv (kernel-3 halo exchange over
    the sharded T axis),
  * NO all-gathers (an all-gather here means GSPMD gave up and replicated
    a stage — the "involuntary full rematerialization" failure mode).

The counts are topology-determined (per _build_level_specs), so pinning
them on a small-channel model pins the plan for the flagship configs too;
the same formula is asserted against the real 1024 topology.
"""
import re

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # sp=8 HLO lowering of the full block stack
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamicrafter_tpu.models.unet3d import (
    UNetConfig, UNetModel, _build_level_specs,
)
from dynamicrafter_tpu.parallel.sharding import (
    SEQ_AXIS, create_mesh, use_mesh,
)


def _collective_counts(hlo_text):
    ops = re.findall(r"= (?:\([^)]*\)|\S+) ([a-z0-9-]+)(?:\.\d+)?\(",
                     hlo_text)
    return {name: sum(1 for o in ops if o == name)
            for name in ("all-to-all", "collective-permute", "all-gather")}


def _expected(cfg: UNetConfig):
    in_s, mid_s, out_s = _build_level_specs(cfg)
    blocks = in_s + [mid_s] + out_s
    n_temporal = sum(1 for b in blocks for s in b if s[0] == "temporal")
    if cfg.addition_attention:
        n_temporal += 1
    n_res = sum(1 for b in blocks for s in b if s[0] == "res")
    n_tconv = 4 * n_res if cfg.temporal_conv else 0
    return n_temporal, n_tconv


@pytest.mark.parametrize("b", [1, 2])
def test_sp8_collective_plan_matches_design(b):
    # b=2 (the CFG-batched shape) is load-bearing: a (B,T)->(B*T) conv fold
    # of a T:'sp'-sharded axis interleaves shards whenever B>1, which GSPMD
    # lowers as an all-to-all+permute around EVERY conv (caught round 3 —
    # the b=1 plan could not see it)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=32,
        attention_resolutions=(2, 1), num_res_blocks=1, channel_mult=(1, 2),
        num_head_channels=16, transformer_depth=1, context_dim=48,
        temporal_conv=True, temporal_attention=True, temporal_length=8,
        addition_attention=True, image_cross_attention=True,
        fs_condition=True)
    unet = UNetModel(cfg, dtype=jnp.float32)
    n_temporal, n_tconv = _expected(cfg)

    t, h, w = 8, 8, 16
    x = jnp.zeros((b, t, h, w, 8))
    ts = jnp.zeros((b,), jnp.int32)
    ct = jnp.zeros((b, 77, 48))
    ci = jnp.zeros((b, t, 4, 48))
    fs = jnp.full((b,), 3, jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, ts, context_text=ct,
                       context_img=ci, fs=fs)["params"]

    mesh = create_mesh(dp=1, sp=8)

    def fn(p, x, ts, ct, ci, fs):
        return unet.apply({"params": p}, x, ts, context_text=ct,
                          context_img=ci, fs=fs)

    with use_mesh(mesh):
        xs = NamedSharding(mesh, P(None, SEQ_AXIS))
        compiled = jax.jit(fn, in_shardings=(
            NamedSharding(mesh, P()), xs, None, None, None, None,
        )).lower(params,
                 jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=xs),
                 ts, ct, ci, fs).compile()
    counts = _collective_counts(compiled.as_text())

    assert counts["all-to-all"] == 2 * n_temporal, counts
    assert counts["collective-permute"] == 2 * n_tconv, counts
    assert counts["all-gather"] == 0, (
        f"all-gather in the sp plan — a stage was involuntarily "
        f"replicated: {counts}")


def test_flagship_1024_topology_collective_budget():
    """The 1024 config's expected plan from the same formula: documents the
    numbers the sp=8 flagship HLO must show (asserted at compile time by
    DRYRUN_FLAGSHIP / recorded in docs/DESIGN.md)."""
    import os

    import yaml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "configs", "inference_1024_v1.0.yaml")) as f:
        raw = yaml.safe_load(f)
    cfg = UNetConfig.from_dict(
        raw["model"]["params"]["unet_config"]["params"])
    n_temporal, n_tconv = _expected(cfg)
    # 16 temporal transformers + init_attn; 22 res blocks x 4 temporal convs
    assert n_temporal == 17
    assert n_tconv == 88
