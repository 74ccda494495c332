#!/usr/bin/env bash
# Production launch shape (north rule: `ray job submit` on a fixed-size
# cluster).  In this sandbox Ray runs local-only, so this script documents
# the cluster form; the CLI itself is identical in both worlds.
#
#   ./scripts/submit_job.sh <ray-address> <input-sf-dir> <output-dir> [shards]
#
# The job is resumable: rerunning after a failure skips every shard whose
# _MANIFEST.json is complete (state/checkpoint.py).
set -euo pipefail
ADDR="${1:?ray address, e.g. http://head:8265}"
INPUT="${2:?input sf dir}"
OUTPUT="${3:?output dir}"
SHARDS="${4:-64}"
exec ray job submit \
  --address "$ADDR" \
  --working-dir "$(dirname "$(dirname "$(readlink -f "$0")")")" \
  -- python -m paddleocr_json_ray \
       --input "$INPUT" --output "$OUTPUT" --shards "$SHARDS"
