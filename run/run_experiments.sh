#!/usr/bin/env bash
# Multi-seed batch submission (the analog of the reference's Slurm scripts,
# /root/reference/run/run_experiments.sh — here a plain sequential/parallel
# local runner; on a TPU pod slice use one invocation per host with
# jax.distributed initialization).
#
# Usage: run/run_experiments.sh configs/GPS/zinc-GPS+RWSE.yaml [repeats]
set -euo pipefail
cfg=${1:?usage: run_experiments.sh <config.yaml> [repeats]}
repeats=${2:-4}
python main.py --cfg "$cfg" --repeat "$repeats"
