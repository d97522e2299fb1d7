"""utils/discovery.py: zero-friction released-weight auto-discovery.

The fidelity gate (scripts/parity_check.py, bench.py `fidelity_gate`,
scripts/deepcache_certify.py real-weight mode) all resolve artifacts through
these helpers, so the search order and the "blocked on:" line format are
load-bearing API.
"""
import gzip
import os

from dynamicrafter_tpu.utils import discovery


def test_env_override_wins(tmp_path, monkeypatch):
    ckpt = tmp_path / "model.ckpt"
    ckpt.write_bytes(b"x")
    monkeypatch.setenv("DYNAMICRAFTER_CKPT_512", str(ckpt))
    assert discovery.find_checkpoint("512") == str(ckpt)
    # resolution-specific override outranks the generic one
    other = tmp_path / "other.ckpt"
    other.write_bytes(b"y")
    monkeypatch.setenv("DYNAMICRAFTER_CKPT", str(other))
    assert discovery.find_checkpoint("512") == str(ckpt)
    assert discovery.find_checkpoint("1024") == str(other)


def test_hf_offline_cache_layout(tmp_path, monkeypatch):
    """models--Doubiiu--DynamiCrafter_512/snapshots/<hash>/model.ckpt — the
    layout gradio's auto-download leaves behind (app.py)."""
    monkeypatch.delenv("DYNAMICRAFTER_CKPT", raising=False)
    monkeypatch.delenv("DYNAMICRAFTER_CKPT_512", raising=False)
    hub = tmp_path / "hub"
    snap = hub / "models--Doubiiu--DynamiCrafter_512" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "model.ckpt").write_bytes(b"x")
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(hub))
    assert discovery.find_checkpoint("512") == str(snap / "model.ckpt")
    # interp variant maps to its own HF repo name
    assert "DynamiCrafter_512_Interp" in " ".join(
        discovery.checkpoint_candidates("512_interp"))


def test_reference_run_script_convention(tmp_path, monkeypatch):
    """./checkpoints/dynamicrafter_<res>_v1/model.ckpt, as scripts/run.sh
    (reference scripts/run.sh:5-8) lays it out."""
    monkeypatch.delenv("DYNAMICRAFTER_CKPT", raising=False)
    d = tmp_path / "checkpoints" / "dynamicrafter_256_v1"
    d.mkdir(parents=True)
    (d / "model.ckpt").write_bytes(b"x")
    monkeypatch.chdir(tmp_path)
    assert discovery.find_checkpoint("256") == os.path.join(
        ".", "checkpoints", "dynamicrafter_256_v1", "model.ckpt")


def test_blocked_line_is_single_and_actionable(monkeypatch):
    monkeypatch.delenv("DYNAMICRAFTER_CKPT", raising=False)
    monkeypatch.delenv("DYNAMICRAFTER_CKPT_512", raising=False)
    monkeypatch.setenv("DYNAMICRAFTER_CKPT_512", "/nonexistent/model.ckpt")
    found, line = discovery.discover("512")
    if found["checkpoint"] is None:
        assert line.startswith("blocked on: ")
        assert "\n" not in line
        assert "/nonexistent/model.ckpt" in line  # names every searched path
    else:  # weights actually mounted: the gate is live, line must be empty
        assert line == "" or found["vocab"] is None


def test_vocab_discovery(tmp_path, monkeypatch):
    vocab = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(vocab, "wt") as f:
        f.write("a b\n")
    monkeypatch.setenv("DYNAMICRAFTER_VOCAB", str(vocab))
    assert discovery.find_vocab() == str(vocab)  # env override wins
    assert discovery.vocab_candidates()[0] == str(vocab)
