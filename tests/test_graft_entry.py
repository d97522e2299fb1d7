"""Driver entry points: dryrun_multichip executes a full sharded train step."""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"), "8"],
        capture_output=True, text=True, env=env, timeout=1500, cwd=repo)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip(8)" in res.stdout
    assert "loss=" in res.stdout


@pytest.mark.slow
def test_entry_shapes():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 16, 40, 64, 4)
