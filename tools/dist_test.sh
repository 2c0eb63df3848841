#!/bin/sh
# Multi-host eval launcher (parity: tools/dist_test.sh).
CONFIG=$1
CKPT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
