#!/bin/sh
cfg=$1; shift
exec python tools/train_self6dpp.py --config "$cfg" "$@"
