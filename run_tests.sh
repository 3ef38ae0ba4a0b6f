#!/bin/sh
# Full CPU test suite, split so each chunk stays within CI timeouts.
set -e
python -m pytest tests/test_geometry.py tests/test_pose_errors.py \
    tests/test_ops.py tests/test_rasterizer.py tests/test_raster_pallas.py \
    tests/test_data_pipeline.py tests/test_det_evaluator.py \
    tests/test_det_loader.py \
    tests/test_samplers.py tests/test_infra.py tests/test_vis_and_misc.py \
    tests/test_structures.py tests/test_necks.py tests/test_trainer.py -q
python -m pytest tests/test_gdrn_model.py tests/test_engine.py \
    tests/test_deepim.py tests/test_self_engine.py tests/test_yolo.py \
    tests/test_repj_refiner.py \
    tests/test_weight_convert.py tests/test_golden_checkpoint.py \
    tests/test_loader_scaling.py -q
# Multi-process (jax.distributed) integration tests: own chunk — each test
# launches real OS worker processes and takes minutes (ADVICE r4).
python -m pytest tests/test_multihost.py -q
