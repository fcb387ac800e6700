#!/usr/bin/env bash
# Submit the KG build as a Ray job on a fixed-size cluster.
#
#   RAY_ADDRESS=http://<head>:8265 ./scripts/submit_build.sh \
#       s3://bucket/pages/ s3://bucket/kg/ gazetteer.json 256
#
# The build is resumable: a re-submitted job skips partitions whose
# manifests exist (kill-and-resume is pytest-gated), so a preempted job
# re-runs only unfinished work. Partition count should be ~2-4x total
# cluster cores so the streaming executor can pipeline and spill.
set -euo pipefail
PAGES="${1:?pages parquet path}"
OUT="${2:?output store dir}"
GAZ="${3:?gazetteer json}"
PARTITIONS="${4:-256}"

exec ray job submit --working-dir "$(dirname "$0")/.." -- \
    python -m rdf_diff_store_ray build \
    --pages "$PAGES" --out "$OUT" --gazetteer "$GAZ" \
    --partitions "$PARTITIONS"
