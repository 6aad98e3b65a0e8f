#!/usr/bin/env bash
# Multi-host (pod-slice) launch recipe.
#
# The reference scales out with per-job Slurm fan-out only
# (/root/reference/run/run_experiments.sh); this framework instead runs ONE
# SPMD program across all hosts of a TPU pod slice: every host executes the
# same command, jax.distributed wires the process group, and the (data, model)
# mesh spans all chips (graphgps_tpu/parallel/mesh.py:init_multihost).
#
# On Cloud TPU VMs the coordinator/process-id env vars are injected by the
# runtime and jax.distributed.initialize() autodetects everything, so:
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all -- \
#     "cd graphgps_tpu && python main.py --cfg $CFG \
#        parallel.data_axis $TOTAL_CHIPS"
#
# On a generic cluster, export the JAX process-group variables per host:
#
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 \
#   JAX_NUM_PROCESSES=<n_hosts> \
#   JAX_PROCESS_ID=<rank> \
#   python main.py --cfg $CFG parallel.data_axis <total_chips>
#
# Notes
# - batch_size is GLOBAL; the driver rounds it up to a multiple of the data
#   axis so shards align with whole graphs (driver.py:create_loaders).
# - parallel.model_axis > 1 layers Megatron tensor parallelism on top; the
#   mesh is laid out so the model axis rides ICI neighbors.
# - checkpoints are orbax PyTree saves from process 0; auto_resume works
#   across restarts (train/loop.py).
# - the 2-process CPU integration test for this path is
#   tests/test_multihost.py.
set -euo pipefail

CFG=${1:?usage: launch_pod.sh <config.yaml> [extra overrides...]}
shift
exec python main.py --cfg "$CFG" "$@"
