#!/usr/bin/env bash
# SLURM launcher — counterpart of the reference's
# tools/scripts/slurm_train.sh (srun + NCCL env rendezvous,
# common_utils.init_dist_slurm builds MASTER_ADDR from scontrol).
#
# TPU mapping: one task per host; jax.distributed.initialize() reads the
# rendezvous from SLURM_* env when the TPU runtime does not provide it
# (coordinator = first node of the job's nodelist).
#
# Usage: sbatch/srun slurm_train.sh <partition> <num_hosts> <train.py args...>
set -euo pipefail
PARTITION=$1
NUM_HOSTS=$2
shift 2
cd "$(dirname "$0")/.."
exec srun -p "${PARTITION}" -N "${NUM_HOSTS}" --ntasks-per-node=1 \
    bash -c '
      MASTER_ADDR=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
      export MASTER_ADDR="${MASTER_ADDR}:12345"
      export WORLD_SIZE="$SLURM_NTASKS" RANK="$SLURM_PROCID"
      exec python train.py --launcher jax "$@"
    ' _ "$@"
