#!/bin/bash
# Interp / loop generation with the 512-interp checkpoint
# (reference scripts/run_application.sh equivalent).
# usage: sh scripts/run_application.sh <interp|loop> [ckpt] [prompt_dir]
set -e
MODE=${1:-interp}
CKPT=${2:-checkpoints/dynamicrafter_512_interp_v1/model.ckpt}
PROMPTS=${3:-prompts/512_${MODE}}
python scripts/inference.py \
  --config configs/inference_512_v1.0.yaml \
  --ckpt_path "$CKPT" --prompt_dir "$PROMPTS" \
  --savedir results/dynamicrafter_512_${MODE} \
  --height 320 --width 512 --frame_stride 5 \
  --ddim_steps 50 --ddim_eta 1.0 --bs 1 \
  --unconditional_guidance_scale 7.5 --text_input --video_length 16 \
  --timestep_spacing uniform_trailing --guidance_rescale 0.7 --perframe_ae \
  --seed 123 --bf16 --${MODE}
