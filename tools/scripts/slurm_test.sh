#!/usr/bin/env bash
# SLURM eval launcher — counterpart of the reference's
# tools/scripts/slurm_test_{single,mgpu}.sh.  Same rendezvous mapping as
# slurm_train.sh; eval results merge across processes via
# merge_results_dist (pickle files on the shared FS + barrier, matching
# the reference's common_utils.py:201-222).
#
# Usage: sbatch/srun slurm_test.sh <partition> <num_hosts> <test.py args...>
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
      exec python test.py --launcher jax "$@"
    ' _ "$@"
