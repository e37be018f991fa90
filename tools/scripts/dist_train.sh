#!/usr/bin/env bash
# Multi-host data-parallel training launcher — counterpart of the
# reference's tools/scripts/dist_train.sh (torchrun/NCCL there).
#
# On TPU pods each *host* runs one process that owns its local chips;
# jax.distributed.initialize() discovers peers from the TPU runtime, so
# on Cloud TPU this script is simply run once per host (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).
# For CPU/GPU multi-process testing, set the explicit rendezvous env:
#   WORLD_SIZE=<n> RANK=<r> MASTER_ADDR=<host:port> dist_train.sh ...
#
# Usage: dist_train.sh <extra train.py args...>
set -euo pipefail
cd "$(dirname "$0")/.."
exec python train.py --launcher jax "$@"
