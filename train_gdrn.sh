#!/bin/sh
# train_gdrn.sh <config> [opts...]  (reference core/gdrn_modeling/train_gdrn.sh)
cfg=$1; shift
exec python tools/train_gdrn.py --config "$cfg" "$@"
