"""Export TPU-trained params back to a reference-format torch checkpoint.

The inverse of the three-format loader (reference
scripts/evaluation/inference.py:34-59): takes an Orbax checkpoint written
by scripts/train.py (a TrainState step dir or a weights-only save_params
dir), merges the exported components over an optional donor checkpoint
(the released .ckpt the fine-tune started from — supplies frozen towers,
schedule buffers, and penultimate-output keys the Flax side never holds),
and writes a .ckpt that the reference torch code loads unchanged.

Usage:
  python scripts/export_checkpoint.py --config configs/inference_512_v1.0.yaml \
      --params /logs/run/checkpoints/9000 --base pretrained/model.ckpt \
      --out exported/model.ckpt [--ema]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="model YAML (reference schema)")
    p.add_argument("--params", required=True,
                   help="Orbax params: a TrainState step dir written by "
                        "scripts/train.py, or a weights-only save_params dir")
    p.add_argument("--base", default=None,
                   help="donor torch checkpoint (.ckpt) to merge over — "
                        "required for a checkpoint the reference can "
                        "strict-load (frozen towers + schedule buffers)")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA shadow weights instead of the "
                        "online params (reference ema_scope eval weights)")
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np
    try:
        import torch
    except ImportError:
        torch = None  # torch-free export via utils/torch_reader

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.models.unet3d import UNetConfig
    from dynamicrafter_tpu.training.checkpoints import load_params
    from dynamicrafter_tpu.utils import weights as W
    from dynamicrafter_tpu.utils.export import export_state_dict

    tree = load_params(args.params)
    if isinstance(tree, dict) and "params" in tree:  # a saved TrainState
        if args.ema:
            if tree.get("ema_params") is None:
                raise SystemExit("--ema: checkpoint has no EMA shadow params")
            tree = tree["ema_params"]
        else:
            tree = tree["params"]
    elif args.ema:
        raise SystemExit("--ema needs a TrainState checkpoint "
                         "(weights-only saves hold no EMA shadow)")

    base_sd = None
    if args.base:
        if torch is not None:
            raw = torch.load(args.base, map_location="cpu", weights_only=True)
        else:
            from dynamicrafter_tpu.utils.torch_reader import (
                load_torch_checkpoint)
            raw = load_torch_checkpoint(args.base)
        base_sd = {k: (v.float().numpy() if hasattr(v, "numpy")
                       else np.asarray(v, np.float32))
                   for k, v in W.normalize_state_dict(raw).items()}

    mc = ModelConfig.from_yaml(args.config)
    ucfg = UNetConfig.from_dict(mc.unet)
    sd = export_state_dict(tree, unet_config=ucfg, base_sd=base_sd)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if torch is not None:
        torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
                   args.out)
    else:
        from dynamicrafter_tpu.utils.torch_reader import save_torch_checkpoint
        save_torch_checkpoint(args.out, {"state_dict": sd})
    comps = ", ".join(sorted(k for k in tree if k in
                             ("unet", "vae", "clip_text", "clip_vision",
                              "resampler")))
    print(f"exported [{comps}] ({len(sd)} keys"
          f"{', merged over ' + args.base if args.base else ''}) -> {args.out}")


if __name__ == "__main__":
    main()
