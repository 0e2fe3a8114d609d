#!/bin/bash
# Multi-chip / multi-host training (replaces the reference's
# train_multi_gpu.sh torchrun+NCCL launch). On a TPU pod slice, run this
# same command on every host; jax.distributed initializes from the TPU
# runtime environment and GSPMD shards over the full mesh.
set -e
CONFIG=${1:-configs/config.yml}
python train.py -c "$CONFIG" "${@:2}"
