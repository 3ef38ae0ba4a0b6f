#!/bin/sh
cfg=$1; shift
exec python tools/train_yolov4.py --config "$cfg" "$@"
