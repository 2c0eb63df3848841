#!/bin/sh
# SLURM eval launcher (parity: tools/slurm_test.sh). Evaluation is
# single-host here (the jitted eval loop saturates one chip's batch);
# multi-host eval sharding rides the same SM3DET_DIST path as training.
#
#   sh tools/slurm_test.sh PARTITION JOB_NAME CONFIG CKPT [args...]
set -e
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CKPT=$4
shift 4
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes=1 \
    --ntasks=1 \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    python -u "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
