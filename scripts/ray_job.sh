#!/usr/bin/env bash
# Cluster submission path (north star: "runs via ray job submit on fixed
# N-node and 4N-node clusters"). In this sandbox Ray is local-only, so this
# script is exercised against a local head; on a real cluster point
# RAY_ADDRESS at the head node — nothing in the engine changes (the code
# never assumes locality: state is partition-owned, IO is directory-based).
#
# Usage:
#   scripts/ray_job.sh bench          # headline benchmark
#   scripts/ray_job.sh scaling        # N vs 4N evidence
#   scripts/ray_job.sh correctness    # query suite vs DuckDB oracles
set -euo pipefail
cd "$(dirname "$0")/.."

TARGET="${1:-bench}"
case "$TARGET" in
  bench)       CMD="python bench.py" ;;
  scaling)     CMD="python bench.py --scaling" ;;
  correctness) CMD="python scripts/check_correctness.py" ;;
  *) echo "unknown target: $TARGET" >&2; exit 2 ;;
esac

if command -v ray >/dev/null && [ -n "${RAY_JOB_SUBMIT:-}" ]; then
  # real cluster path: ship the working dir, run on the cluster
  exec ray job submit --working-dir . -- $CMD
else
  # sandbox path: same entrypoint, local session
  exec $CMD
fi
