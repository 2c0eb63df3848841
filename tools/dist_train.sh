#!/bin/sh
# Multi-host training launcher (parity: tools/dist_train.sh).
# On TPU pods JAX discovers the topology from the environment
# (jax.distributed.initialize); one process per host:
#   JAX_COORDINATOR=<host0:port> NPROC=<hosts> sh tools/dist_train.sh CFG [args]
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
