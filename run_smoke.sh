#!/bin/sh
# End-to-end CLI smoke on generated synthetic BOP data — the regression net
# for the tools/*.py surfaces (chained: gdrn train+eval -> pseudo poses ->
# stage-II with TRAIN2/geo/refiner/repj paths on).
#
# Runs on CPU by default (S6TPU_PLATFORM=cpu forces the platform before the
# first backend use); set S6TPU_PLATFORM= to use the default accelerator.
set -e
export S6TPU_PLATFORM="${S6TPU_PLATFORM-cpu}"
ROOT="${SMOKE_ROOT:-/tmp/bopdata}"
OUT="${SMOKE_OUT:-/tmp/smoke_out}"
rm -rf "$ROOT" "$OUT"

echo "== generate synthetic BOP data =="
python tools/make_synthetic_bop.py "$ROOT" --full --images 6

echo "== stage-I GDRN train =="
python tools/train_gdrn.py --config configs/gdrn/synthetic_smoke.py \
    --opts solver.total_iters=12 ckpt_period=12

echo "== YOLOv4 detector train (mosaic/affine/HSV aug + in-train mAP) =="
python tools/train_yolov4.py --config configs/gdrn/synthetic_smoke.py \
    --opts exp_name=yolo_synthetic_smoke solver.total_iters=6 ckpt_period=6 \
    det.input_size=128 det.aug_mosaic=true det.rand_rotate_deg=5 \
    det.rand_translate=0.1 det.rand_shear=2 test.eval_period=6

echo "== YOLOv4 detect (COCO AP table + the det-json contract) =="
python tools/train_yolov4.py --config configs/gdrn/synthetic_smoke.py \
    --eval-only --out-det "$OUT/yolo_dets.json" \
    --opts exp_name=yolo_synthetic_smoke det.input_size=128

echo "== stage-I GDRN eval on YOLO detections (BOP csv + ADD tables) =="
python tools/train_gdrn.py --config configs/gdrn/synthetic_smoke.py \
    --eval-only --det-file "$OUT/yolo_dets.json"

echo "== pseudo-pose generation from YOLO detections =="
python tools/gen_pseudo_poses.py --config configs/gdrn/synthetic_smoke.py \
    --gdrn-ckpt "$OUT/gdrn_synthetic_smoke/ckpt" \
    --det-file "$OUT/yolo_dets.json" --out "$OUT/pseudo.json"

echo "== stage-II self-supervised train (TRAIN2 + geo + refiner + repj + in-train eval) =="
python tools/train_self6dpp.py --config configs/self6dpp/synthetic_smoke.py \
    --weights "$OUT/gdrn_synthetic_smoke/ckpt" \
    --det-file "$OUT/pseudo.json" \
    --opts solver.total_iters=8 ckpt_period=8 test.eval_period=4

echo "== deepim smoke train =="
python tools/train_deepim.py --config configs/deepim/synthetic_smoke.py \
    --opts solver.total_iters=4 ckpt_period=4

echo "SMOKE OK"
