#!/usr/bin/env bash
# Sequential sweep over a directory of configs (reference run_experiments
# batch semantics): marks each consumed config done.
set -euo pipefail
dir=${1:?usage: run_batch.sh <config-dir> [repeats]}
repeats=${2:-1}
for cfg in "$dir"/*.yaml; do
  echo "=== $cfg"
  python main.py --cfg "$cfg" --repeat "$repeats" --mark_done
done
