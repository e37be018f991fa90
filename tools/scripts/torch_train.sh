#!/usr/bin/env bash
# Counterpart of the reference's tools/scripts/torch_train.sh (torchrun
# rendezvous + NCCL).  There is no per-GPU process model here: one JAX
# process per host owns all local TPU chips and the data mesh shards the
# batch, so the torchrun port dance is unnecessary — this is the same
# entry as dist_train.sh, kept under the reference's script name so
# existing launch tooling keeps working.
#
# Usage: torch_train.sh <NPROCS-ignored> <extra train.py args...>
set -euo pipefail
if [[ $# -ge 1 && "$1" =~ ^[0-9]+$ ]]; then shift; fi  # reference NGPUS arg
cd "$(dirname "$0")/.."
exec python train.py --launcher jax "$@"
