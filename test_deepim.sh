#!/bin/sh
cfg=$1; shift
exec python tools/train_deepim.py --config "$cfg" --eval-only "$@"
