#!/bin/sh
# test_gdrn.sh <config> [opts...]
cfg=$1; shift
exec python tools/train_gdrn.py --config "$cfg" --eval-only "$@"
