"""Auto-discovery of released weights / vocab from standard mount points.

The fidelity gate (PSNR>40 vs reference frames, BASELINE.md) is blocked in
sandboxes without network access — this module keeps the friction at zero
for the moment weights appear: scripts/parity_check.py and bench.py call
`find_checkpoint`/`find_vocab` and, when something is missing, print ONE
actionable "blocked on:" line listing exactly which artifacts are absent
and every path that was searched.

Searched layouts per resolution (reference checkpoint table, README.md:292):
  * $DYNAMICRAFTER_CKPT / $DYNAMICRAFTER_CKPT_<RES> env overrides
    ($DYNAMICRAFTER_VOCAB for the BPE vocab)
  * ./checkpoints/dynamicrafter_<res>[_interp]_v1/model.ckpt
    (the reference run-script convention, scripts/run.sh)
  * common mount roots: /root, /data, /mnt, /models
  * the HF hub offline cache (~/.cache/huggingface/hub or $HF_HOME):
    models--Doubiiu--DynamiCrafter[_512|_1024|_512_Interp]/snapshots/*/
    model.ckpt (the repos gradio auto-downloads from, app.py)
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

_HF_REPOS = {
    "256": "DynamiCrafter",
    "512": "DynamiCrafter_512",
    "1024": "DynamiCrafter_1024",
    "512_interp": "DynamiCrafter_512_Interp",
}

_MOUNT_ROOTS = tuple(dict.fromkeys(
    (".", os.path.expanduser("~"), "/root", "/data", "/mnt", "/models")))


def _hf_cache_dirs() -> List[str]:
    dirs = []
    hf_home = os.environ.get("HF_HOME")
    if hf_home:
        dirs.append(os.path.join(hf_home, "hub"))
    if os.environ.get("HUGGINGFACE_HUB_CACHE"):
        dirs.append(os.environ["HUGGINGFACE_HUB_CACHE"])
    dirs.append(os.path.expanduser("~/.cache/huggingface/hub"))
    return dirs


def checkpoint_candidates(resolution: str) -> List[str]:
    """Every path (or glob) searched for a released model.ckpt."""
    res = resolution.lower()
    dirname = f"dynamicrafter_{res}_v1"
    cands = []
    for var in (f"DYNAMICRAFTER_CKPT_{res.upper()}", "DYNAMICRAFTER_CKPT"):
        if os.environ.get(var):
            cands.append(os.environ[var])
    for root in _MOUNT_ROOTS:
        cands.append(os.path.join(root, "checkpoints", dirname, "model.ckpt"))
    repo = _HF_REPOS.get(res)
    if repo:
        for hub in _hf_cache_dirs():
            cands.append(os.path.join(
                hub, f"models--Doubiiu--{repo}", "snapshots", "*",
                "model.ckpt"))
    return cands


def vocab_candidates() -> List[str]:
    from dynamicrafter_tpu.utils.tokenizer import _DEFAULT_VOCAB_CANDIDATES

    cands = []
    if os.environ.get("DYNAMICRAFTER_VOCAB"):
        cands.append(os.environ["DYNAMICRAFTER_VOCAB"])
    cands += list(_DEFAULT_VOCAB_CANDIDATES)
    for root in _MOUNT_ROOTS:
        cands.append(os.path.join(root, "bpe_simple_vocab_16e6.txt.gz"))
    # open_clip ships the vocab inside the package
    try:
        import open_clip  # type: ignore

        cands.append(os.path.join(os.path.dirname(open_clip.__file__),
                                  "bpe_simple_vocab_16e6.txt.gz"))
    except ImportError:
        pass
    return cands


def _first_existing(candidates: List[str]) -> Optional[str]:
    for cand in candidates:
        if "*" in cand:
            hits = sorted(glob.glob(cand))
            if hits:
                return hits[0]
        elif os.path.exists(cand):
            return cand
    return None


def find_checkpoint(resolution: str) -> Optional[str]:
    return _first_existing(checkpoint_candidates(resolution))


def find_vocab() -> Optional[str]:
    return _first_existing(vocab_candidates())


def discover(resolution: str) -> Tuple[Dict[str, Optional[str]], str]:
    """(found, blocked_line). blocked_line is "" when everything is present,
    else ONE actionable line naming what is missing and where it was
    sought."""
    found = {"checkpoint": find_checkpoint(resolution),
             "vocab": find_vocab()}
    missing = []
    if found["checkpoint"] is None:
        missing.append("checkpoint (searched: "
                       + ", ".join(checkpoint_candidates(resolution)) + ")")
    if found["vocab"] is None:
        missing.append("vocab bpe_simple_vocab_16e6.txt.gz (searched: "
                       + ", ".join(vocab_candidates()) + ")")
    line = "blocked on: " + "; ".join(missing) if missing else ""
    return found, line
