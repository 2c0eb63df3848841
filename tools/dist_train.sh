#!/bin/sh
# Multi-host training launcher (parity: tools/dist_train.sh, which wraps
# torch.distributed.launch; here one process per host joins the JAX
# coordination service and tools/train.py builds the global mesh).
#
# Single host, all local chips:
#   sh tools/dist_train.sh CFG [args]
# Multi-host (run on every host):
#   JAX_COORDINATOR_ADDRESS=<host0:port> NPROC=<n_hosts> PROC_ID=<rank> \
#     sh tools/dist_train.sh CFG [args]
CONFIG=$1
shift
SM3DET_DIST=${SM3DET_DIST:-1} \
    python "$(dirname "$0")/train.py" "$CONFIG" "$@"
