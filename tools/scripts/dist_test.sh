#!/usr/bin/env bash
# Multi-host evaluation launcher — counterpart of the reference's
# tools/scripts/dist_test.sh.  tools/test.py initializes the JAX
# distributed runtime under --launcher, shards the eval set per process
# (pad + stride, the reference DistributedSampler semantics) and merges
# per-rank predictions through common_utils.merge_results_dist.
# Rendezvous env as in dist_train.sh:
#   WORLD_SIZE=<n> RANK=<r> MASTER_ADDR=<host[:port]> dist_test.sh ...
#
# Runs from the CALLER's cwd (output/ lands there).
#
# Usage: dist_test.sh <extra test.py args...>
set -euo pipefail
DIR="$(cd "$(dirname "$0")/.." && pwd)"
exec python "$DIR/test.py" --launcher jax "$@"
