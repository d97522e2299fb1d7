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
