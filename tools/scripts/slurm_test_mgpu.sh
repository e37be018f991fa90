#!/usr/bin/env bash
# Counterpart of the reference's slurm_test_mgpu.sh: multi-task eval under
# SLURM.  Each task is one host-process; jax.distributed.initialize()
# rendezvous comes from the SLURM env (see slurm_train.sh).
# Usage: slurm_test_mgpu.sh <partition> <ntasks> <extra test.py args...>
set -euo pipefail
PARTITION=$1; NTASKS=$2; shift 2
SRUN_ARGS=${SRUN_ARGS:-""}
cd "$(dirname "$0")/.."
exec srun -p "${PARTITION}" --job-name=eval --ntasks="${NTASKS}" \
    --kill-on-bad-exit=1 ${SRUN_ARGS} \
    python -u test.py --launcher slurm "$@"
