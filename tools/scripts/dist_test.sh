#!/usr/bin/env bash
# Multi-host evaluation launcher — counterpart of the reference's
# tools/scripts/dist_test.sh.  Per-process dataset sharding + the
# all-gather result merge are handled inside tools/test.py when
# jax.process_count() > 1 (eval/eval_utils.py).
#
# Usage: dist_test.sh <extra test.py args...>
set -euo pipefail
cd "$(dirname "$0")/.."
exec python test.py --launcher jax "$@"
