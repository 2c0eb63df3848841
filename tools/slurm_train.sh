#!/bin/sh
# SLURM multi-host training launcher (parity: tools/slurm_train.sh,
# which wraps `srun python -u tools/train.py --launcher slurm`; here
# each SLURM task is one JAX process that joins the coordination
# service — jax.distributed.initialize auto-detects SLURM_* env).
#
#   sh tools/slurm_train.sh PARTITION JOB_NAME CONFIG [args...]
#
# Env: GPUS_PER_NODE is the reference's name; on TPU pods each host's
# chips are discovered automatically, so only NODES matters.
set -e
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-}

# srun propagates the caller's environment, so export rather than wrap
# in `sh -c` (which would re-split/glob-expand argv and mangle configs
# or --cfg-options values containing spaces/brackets).
export SM3DET_DIST=1

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NODES" \
    --ntasks="$NODES" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    python -u "$(dirname "$0")/train.py" "$CONFIG" "$@"
