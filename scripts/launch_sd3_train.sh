#!/usr/bin/env bash
# TPU analogue of the reference's torchrun launch
# (reference: scripts/launch_sd3_train.sh:1-43) with the paper training
# recipe: gamma=0.97, init alpha=2.5 beta=1.0, kl_coef=0, lr=1e-6
# constant, per-device batch 8, grad-clip 1.0 (launch_sd3_train.sh:16-40).
#
# Single host owns all local chips through one process (GSPMD shards the
# whole program over the mesh — no per-chip process spawning needed, the
# torchrun analogue is jax.distributed across HOSTS only):
#
#   bash scripts/launch_sd3_train.sh                        # one host
#   NUM_HOSTS=4 bash scripts/launch_sd3_train.sh            # per host on a pod
#                                                           # (jax.distributed
#                                                           # auto-discovers on TPU)
#
# Component YAMLs play the reference's hydra _target_ configs; override
# via MODEL_CONFIG/REWARD_CONFIG/DATASET_CONFIG. WATCHDOG=host:port adds
# out-of-band failure detection (docs/OPERATIONS.md).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_CONFIG=${MODEL_CONFIG:-configs/models/toy_agent.yaml}
REWARD_CONFIG=${REWARD_CONFIG:-configs/models/toy_reward.yaml}
DATASET_CONFIG=${DATASET_CONFIG:-configs/datasets/jsonl_prompts.yaml}
OUTPUT_DIR=${OUTPUT_DIR:-runs/sd3_rloo}
MESH=${MESH:-auto}            # data,fsdp,tensor or "auto"
EXTRA=( )
[ "${NUM_HOSTS:-1}" -gt 1 ] && EXTRA+=( --multihost )
[ -n "${WATCHDOG:-}" ] && EXTRA+=( --watchdog_coordinator "$WATCHDOG" )

exec python main_train.py \
  --model_config "$MODEL_CONFIG" \
  --reward_model_config "$REWARD_CONFIG" \
  --train_dataset "$DATASET_CONFIG" \
  --mesh_shape "$MESH" \
  --output_dir "$OUTPUT_DIR" \
  --gamma 0.97 \
  --init_alpha 2.5 --init_beta 1.0 \
  --kl_coef 0.0 \
  --learning_rate 1e-6 \
  --per_device_train_batch_size 8 \
  --max_grad_norm 1.0 \
  --rloo_k 2 \
  --num_ppo_epochs 4 \
  --max_inference_steps 28 \
  --save_steps 50 --logging_steps 1 \
  --resume_from_checkpoint "${RESUME:-false}" \
  "${EXTRA[@]}" "$@"
