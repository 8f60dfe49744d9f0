#!/usr/bin/env bash
# Multi-host training launcher (the torchrun dist_train.sh equivalent —
# reference: tools/dist_train.sh). On TPU pods every host runs the same
# command; jax.distributed wires them via the coordinator address.
#
# Usage: JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 \
#        JAX_PROCESS_ID=$SLURM_PROCID ./scripts/dist_train.sh CONFIG [args...]
set -euo pipefail
CONFIG=$1; shift
exec python -m recondet3d.cli.train "$CONFIG" "$@"
