#!/bin/bash
# Multi-host data-parallel inference (reference scripts/run_mp.sh equivalent).
# usage: NUM_PROCESSES=2 PROCESS_ID=0 COORDINATOR=host:1234 sh scripts/run_mp.sh 512
set -e
RES=${1:-512}
python scripts/distributed_inference.py \
  --coordinator "${COORDINATOR}" --num_processes "${NUM_PROCESSES:-1}" \
  --process_id "${PROCESS_ID:-0}" \
  --config configs/inference_${RES}_v1.0.yaml \
  --ckpt_path "checkpoints/dynamicrafter_${RES}_v1/model.ckpt" \
  --prompt_dir "prompts/${RES}" --savedir results/mp_${RES} \
  --height 320 --width 512 --frame_stride 24 --ddim_steps 50 \
  --unconditional_guidance_scale 7.5 --text_input --bf16 \
  --timestep_spacing uniform_trailing --guidance_rescale 0.7 --perframe_ae
