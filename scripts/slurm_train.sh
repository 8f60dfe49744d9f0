#!/usr/bin/env bash
# SLURM launcher (reference: tools/slurm_train.sh). One task per host.
set -euo pipefail
PARTITION=$1; JOB_NAME=$2; CONFIG=$3; shift 3
NODES=${NODES:-1}
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     bash -c 'JAX_COORDINATOR_ADDRESS=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -1):8476 \
              JAX_NUM_PROCESSES=$SLURM_NTASKS JAX_PROCESS_ID=$SLURM_PROCID \
              python -m recondet3d.cli.train '"$CONFIG"' '"$*"
