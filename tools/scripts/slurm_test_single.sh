#!/usr/bin/env bash
# Counterpart of the reference's slurm_test_single.sh: single-task eval
# under SLURM.  Usage: slurm_test_single.sh <partition> <extra test.py args...>
set -euo pipefail
PARTITION=$1; shift
SRUN_ARGS=${SRUN_ARGS:-""}
cd "$(dirname "$0")/.."
exec srun -p "${PARTITION}" --job-name=eval --ntasks=1 --ntasks-per-node=1 \
    --kill-on-bad-exit=1 ${SRUN_ARGS} \
    python -u test.py "$@"
