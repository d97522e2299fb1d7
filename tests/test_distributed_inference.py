"""Multi-host inference launcher: 2 simulated processes, disjoint prompts.

Invokes scripts/distributed_inference.py exactly as scripts/run_mp.sh does
(same flag forms, incl. space-separated values), minus the coordinator so
no jax.distributed rendezvous is needed — the prompt-slicing and arg
plumbing (the round-2 argv-re-parse crash) are what's under test.
Reference: scripts/evaluation/ddp_wrapper.py:29-47.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-process subprocess launch

from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG


def _run_proc(repo, cfg_path, pdir, savedir, pid, nproc):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "distributed_inference.py"),
         # run_mp.sh passes these as space-separated flag/value pairs —
         # the exact form the round-2 argv filter mangled
         "--num_processes", str(nproc), "--process_id", str(pid),
         "--config", str(cfg_path), "--prompt_dir", str(pdir),
         "--savedir", str(savedir), "--random_init",
         "--height", "16", "--width", "16", "--video_length", "4",
         "--ddim_steps", "2", "--timestep_spacing", "uniform_trailing",
         "--unconditional_guidance_scale", "2.0", "--text_input",
         "--frame_stride", "3"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    return sorted(p.name for p in savedir.glob("*.mp4"))


def test_two_process_prompt_slicing_disjoint(tmp_path):
    import yaml
    from PIL import Image

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.dump(TINY_MODEL_CONFIG))
    pdir = tmp_path / "prompts"
    pdir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a_img", "b_img"):
        Image.fromarray(rng.uniform(0, 255, (20, 20, 3)).astype(np.uint8)) \
            .save(pdir / f"{name}.png")
    (pdir / "prompts.txt").write_text("a spinning top\na rolling ball\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out0 = tmp_path / "out0"
    out1 = tmp_path / "out1"
    files0 = _run_proc(repo, cfg_path, pdir, out0, pid=0, nproc=2)
    files1 = _run_proc(repo, cfg_path, pdir, out1, pid=1, nproc=2)

    assert len(files0) == 1 and len(files1) == 1
    assert not set(files0) & set(files1), "processes produced the same prompt"
    assert len(set(files0) | set(files1)) == 2, "a prompt was dropped"
