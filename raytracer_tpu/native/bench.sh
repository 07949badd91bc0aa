#!/usr/bin/env bash
# Native converter throughput harness (analog of reference test.sh:3-6):
# run the converter N times (default 100) against data/BVH2.bin.
set -euo pipefail
cd "$(dirname "$0")/../.."
N=${1:-100}
for ((i = 0; i < N; i++)); do
  ./bin/bvh_convert "${2:-data/BVH2.bin}" "${3:-data/BVH4_wide.bin}"
done
