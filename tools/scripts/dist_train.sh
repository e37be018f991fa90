#!/usr/bin/env bash
# Multi-host data-parallel training launcher — counterpart of the
# reference's tools/scripts/dist_train.sh (torchrun/NCCL there).
#
# On TPU pods each *host* runs one process that owns its local chips;
# jax.distributed.initialize() discovers peers from the TPU runtime, so
# on Cloud TPU this script is simply run once per host (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).
# For CPU/GPU multi-process runs, set the torchrun-style rendezvous env:
#   WORLD_SIZE=<n> RANK=<r> MASTER_ADDR=<host[:port]> dist_train.sh ...
# (pdanet_tpu.utils.common_utils.init_dist_jax consumes these.)
#
# Runs from the CALLER's cwd (output/ lands there, like the reference's
# torch.distributed.launch invocation from tools/).
#
# Usage: dist_train.sh <extra train.py args...>
set -euo pipefail
DIR="$(cd "$(dirname "$0")/.." && pwd)"
exec python "$DIR/train.py" --launcher jax "$@"
