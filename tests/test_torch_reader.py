"""Torch-free checkpoint reader vs torch.load (utils/torch_reader.py).

Serving hosts can load released .ckpt files without torch installed; the
reader must agree bit-for-bit with torch.load on every dtype and layout a
state dict can contain.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dynamicrafter_tpu.utils.torch_reader import load_torch_checkpoint  # noqa: E402


def test_reader_matches_torch_load(tmp_path):
    g = torch.Generator().manual_seed(0)
    base = torch.randn(4, 6, generator=g)
    sd = {
        "w_f32": torch.randn(3, 5, generator=g),
        "w_f16": torch.randn(2, 7, generator=g).half(),
        "w_bf16": torch.randn(8, generator=g).bfloat16(),
        "w_i64": torch.arange(10),
        "w_bool": torch.tensor([True, False, True]),
        "w_scalar": torch.tensor(3.25),
        # non-contiguous view: exercises stride-aware rebuild
        "w_strided": base[:, ::2],
        # shared storage with an offset
        "w_offset": base.reshape(-1)[5:17],
    }
    path = str(tmp_path / "model.ckpt")
    torch.save({"state_dict": sd}, path)

    got = load_torch_checkpoint(path)["state_dict"]
    ref = torch.load(path, map_location="cpu", weights_only=True)["state_dict"]
    assert set(got) == set(ref)
    for k in ref:
        r = ref[k].float().numpy() if ref[k].dtype == torch.bfloat16 \
            else ref[k].numpy()
        gv = np.asarray(got[k], dtype=np.float32) \
            if k == "w_bf16" else np.asarray(got[k])
        assert gv.shape == r.shape, k
        np.testing.assert_array_equal(gv, r.astype(gv.dtype), err_msg=k)


def test_reader_rejects_arbitrary_globals(tmp_path):
    path = str(tmp_path / "evil.ckpt")

    class Payload:
        def __reduce__(self):
            return (print, ("pwned",))

    torch.save({"x": Payload()}, path)
    import pickle
    with pytest.raises(pickle.UnpicklingError, match="refusing global"):
        load_torch_checkpoint(path)


@pytest.mark.parametrize("deepspeed", [False, True])
def test_from_checkpoint_without_torch(tmp_path, monkeypatch, deepspeed):
    """The full pipeline load path works with torch unimportable."""
    from test_full_checkpoint import build_fake_checkpoint

    cfg_path, ckpt_path, _ = build_fake_checkpoint(tmp_path,
                                                   deepspeed=deepspeed)

    from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
    # None in sys.modules makes `import torch` raise ImportError
    monkeypatch.setitem(sys.modules, "torch", None)
    pipe = DynamiCrafterPipeline.from_checkpoint(
        cfg_path, ckpt_path, allow_hash_tokenizer=True)
    assert pipe.params is not None and "unet" in pipe.params
    z = pipe.embed_text(["hello"])
    assert np.isfinite(np.asarray(z)).all()


def test_writer_roundtrip_via_torch(tmp_path):
    from dynamicrafter_tpu.utils.torch_reader import save_torch_checkpoint
    import ml_dtypes

    rng = np.random.default_rng(0)
    sd = {
        "state_dict": {
            "a.weight": rng.standard_normal((3, 4)).astype(np.float32),
            "b.bias": rng.standard_normal((7,)).astype(np.float16),
            "c.table": rng.standard_normal((5,)).astype(ml_dtypes.bfloat16),
            "d.steps": np.arange(6, dtype=np.int64),
            "e.flag": np.array(True),
        },
        "meta": {"step": 123, "name": "export"},
    }
    path = str(tmp_path / "out.ckpt")
    save_torch_checkpoint(path, sd)

    # torch reads it (the reference's consumption path)
    ref = torch.load(path, map_location="cpu", weights_only=True)
    assert ref["meta"] == {"step": 123, "name": "export"}
    for k, v in sd["state_dict"].items():
        tv = ref["state_dict"][k]
        if v.dtype == ml_dtypes.bfloat16:
            assert tv.dtype == torch.bfloat16
            np.testing.assert_array_equal(tv.float().numpy(),
                                          v.astype(np.float32))
        else:
            np.testing.assert_array_equal(tv.numpy(), v)

    # and our own reader agrees
    got = load_torch_checkpoint(path)
    np.testing.assert_array_equal(got["state_dict"]["a.weight"],
                                  sd["state_dict"]["a.weight"])


def test_export_cli_without_torch(tmp_path):
    """scripts/export_checkpoint.py on a torch-less host: donor read via
    the stdlib reader, output written by save_torch_checkpoint, and the
    result loads in torch (the reference's consumption path)."""
    import os
    import subprocess

    import jax

    from test_full_checkpoint import build_fake_checkpoint
    from dynamicrafter_tpu.training.checkpoints import save_params
    from dynamicrafter_tpu.utils import weights as W

    cfg_path, ckpt_path, _ = build_fake_checkpoint(tmp_path)
    sd = {k: (v.float().numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in W.normalize_state_dict(
              torch.load(ckpt_path, map_location="cpu",
                         weights_only=True)).items()}
    groups = W.split_reference_checkpoint(sd)
    trainable = {"unet": jax.tree_util.tree_map(
        lambda x: x + 1.0, W.convert_unet(groups["unet"]))}
    state_dir = tmp_path / "orbax_state"
    save_params(str(state_dir), {"params": trainable,
                                 "step": np.zeros((), np.int32)})

    # block torch in the subprocess via a poisoned module on PYTHONPATH
    blocker = tmp_path / "noTorch"
    blocker.mkdir()
    (blocker / "torch.py").write_text(
        "raise ImportError('torch blocked for torch-free export test')\n")

    out_path = tmp_path / "exported" / "model.ckpt"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_checkpoint.py"),
         "--config", cfg_path, "--params", str(state_dir),
         "--base", ckpt_path, "--out", str(out_path)],
        capture_output=True, text=True, timeout=300, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
             "PYTHONPATH": f"{blocker}:{os.environ.get('PYTHONPATH', '')}"})
    assert res.returncode == 0, res.stderr[-3000:]

    new_sd = torch.load(out_path, map_location="cpu",
                        weights_only=True)["state_dict"]
    np.testing.assert_allclose(
        new_sd["model.diffusion_model.out.2.bias"].numpy(),
        sd["model.diffusion_model.out.2.bias"] + 1.0, atol=1e-6)
    np.testing.assert_array_equal(new_sd["betas"].numpy(), sd["betas"])
