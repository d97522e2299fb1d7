#!/bin/bash
# Interpolation/looping fine-tune launcher (reference
# configs/training_512_v1.0/run_interp.sh equivalent: the base 512 recipe
# with config_interp.yaml — interp_mode on, rand_cond_frame off, interp
# pretrained weights).
# usage: sh scripts/run_interp.sh [save_root]
set -e
SAVE_ROOT=${1:-runs}
NAME=training_512_interp

mkdir -p "$SAVE_ROOT/$NAME"

python scripts/train.py \
  --base configs/training_512_interp.yaml \
  --train \
  --name "$NAME" \
  --logdir "$SAVE_ROOT" \
  "${@:2}"
