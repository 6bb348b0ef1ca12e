#!/usr/bin/env bash
# Cluster entry (SURVEY.md §3.2 EP2): run the flagship pipeline as a Ray
# job with resumable per-partition checkpoints. On the sandbox this runs
# against the local session; on a real cluster point RAY_ADDRESS at the
# head node — the CLI detects an existing cluster and does not re-init.
#
#   ./scripts/submit_job.sh <input parquet/dir> <output dir> [rows_per_partition]
#
# A killed job resumes from committed partitions on re-submit (manifests
# under <output>/_manifest/, config-hash guarded).
set -euo pipefail
INPUT=${1:?input parquet path}
OUT=${2:?output dir}
ROWS=${3:-2000000}

if command -v ray >/dev/null && [ -n "${RAY_JOB_SUBMIT:-}" ]; then
  exec ray job submit --working-dir "$(dirname "$0")/.." -- \
    python -m go_logagent_ray.cli flagship \
      --input "$INPUT" --out "$OUT" --checkpoint --rows-per-partition "$ROWS"
fi
exec python -m go_logagent_ray.cli flagship \
  --input "$INPUT" --out "$OUT" --checkpoint --rows-per-partition "$ROWS"
