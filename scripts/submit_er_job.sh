#!/usr/bin/env bash
# Submit the resumable ER pipeline to a running Ray cluster as a Ray job.
#
#   scripts/submit_er_job.sh <dashboard-address> [er-args...]
#
# e.g.
#   scripts/submit_er_job.sh http://head:8265 \
#     --input s3://bucket/docs_lance --out s3://bucket/er_out \
#     --checkpoint-dir s3://bucket/er_ckpt --resume
#
# The job ships this repo as the working dir; the entrypoint is the same
# CLI used locally (`python -m dedupe_rust_ray er ...`), which attaches to
# the cluster Ray (`ray.init(address="auto")` inside _ensure_ray) instead
# of starting one. Run it once against an N-node cluster and once against
# a 4N-node cluster on the same input to measure scaling efficiency; the
# job prints docs/s on completion and writes per-partition lineage
# manifests + counters under --checkpoint-dir.
set -euo pipefail

ADDRESS="${1:?usage: submit_er_job.sh <dashboard-address> [er-args...]}"
shift

exec ray job submit \
  --address "$ADDRESS" \
  --working-dir "$(cd "$(dirname "$0")/.." && pwd)" \
  --runtime-env-json '{"excludes": [".git", "BENCH", "tests"]}' \
  -- python -m dedupe_rust_ray er "$@"
