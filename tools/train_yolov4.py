"""YOLOv4 detector train/test CLI (reference det/yolov4/main_yolov4.py).

Train mode runs the full reference augmentation pipeline (mosaic / random
affine / HSV / flips — det/yolov4/datasets/data_loader.py:58-120,230-330)
via self6dpp_tpu.data.det_loader and, when test.eval_period > 0, computes
COCO mAP on the test split in-train (ref det/yolov4/engine/engine.py:91-133).

Test mode (--eval-only) computes the COCO AP table
(engine/det_evaluator.py, ref yolov4_coco_evaluation.py) AND writes the
detection json contract consumed by GDRN/self6dpp loaders
(core/utils/dataset_utils.py:120): per scene_im_id a list of
{obj_id, bbox_est [x,y,w,h], score, time}.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--out-det", default="", help="output detection json")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-max-images", type=int, default=0,
                   help="cap in-train eval set size (0 = all)")
    p.add_argument("--opts", nargs="*", default=[])
    from self6dpp_tpu.parallel.mesh import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def run_detector_eval(model, ycfg, state, dataset, bs, class_to_obj_id,
                      max_images=0):
    """Inference + NMS over the eval split; returns (AP table, det json
    rows, per-image seconds). Detections are mapped back to the original
    frame before scoring (EvalShapes.to_original)."""
    from self6dpp_tpu.engine.det_evaluator import DetEvaluator
    from self6dpp_tpu.models.yolo import decode_predictions, non_max_suppression

    @jax.jit
    def infer(state, x):
        outs = model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, x)
        return decode_predictions(outs, ycfg)

    evaluator = DetEvaluator(num_classes=ycfg.num_classes)
    dets: dict[str, list] = {}
    n_done = 0
    for imgs, shapes, gts, recs in dataset.eval_batches(bs):
        t0 = time.perf_counter()
        pred = np.asarray(infer(state, imgs))
        dt = (time.perf_counter() - t0) / len(recs)
        nms = non_max_suppression(pred, ycfg.conf_thresh, ycfg.iou_thresh)
        for d, sh, gt, rec in zip(nms, shapes, gts, recs):
            d = np.asarray(d, np.float32).reshape(-1, 6)
            boxes = sh.to_original(d[:, :4])
            evaluator.add_image(
                rec.scene_im_id, boxes, d[:, 5], d[:, 4],
                gt[:, 1:5], gt[:, 0])
            rows = []
            for (x1, y1, x2, y2), (score, cls) in zip(boxes, d[:, 4:6]):
                rows.append({
                    "obj_id": class_to_obj_id(int(cls)),
                    "bbox_est": [float(x1), float(y1),
                                 float(x2 - x1), float(y2 - y1)],
                    "score": float(score), "time": dt})
            dets[rec.scene_im_id] = rows
            n_done += 1
        if max_images and n_done >= max_images:
            break
    return evaluator.evaluate(), dets, dt


def main():
    args = parse_args()
    # multi-host: must run before any other JAX backend use
    from self6dpp_tpu.parallel.mesh import maybe_init_distributed_from_args
    maybe_init_distributed_from_args(args)
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.data.bop import load_bop_split, save_detections
    from self6dpp_tpu.data.det_loader import DetDataset
    from self6dpp_tpu.data.ref import get_meta
    from self6dpp_tpu.engine.checkpoint import CheckpointManager
    from self6dpp_tpu.engine.optim import build_optimizer
    from self6dpp_tpu.engine.train_state import create_train_state
    from self6dpp_tpu.engine.trainer import do_train
    from self6dpp_tpu.engine.writers import setup_logger
    from self6dpp_tpu.models.yolo import YOLOv4, YoloConfig, yolo_loss

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(os.path.join(cfg.output_dir, cfg.exp_name))
    meta = get_meta(cfg.data.test_datasets[0])
    ycfg = YoloConfig(num_classes=meta.num_objects,
                      input_size=cfg.det.input_size,
                      width_multiple=cfg.det.width_multiple,
                      depth_multiple=cfg.det.depth_multiple)
    model = YOLOv4(cfg=ycfg)

    def class_of_obj_id(oid: int) -> int:
        return meta.objects.index(meta.id2obj[oid])

    def class_to_obj_id(cls: int) -> int:
        return meta.obj2id[meta.objects[cls]]

    test_dir = os.path.join(cfg.data.dataset_root, meta.name, "test")
    test_records = load_bop_split(test_dir)
    test_set = DetDataset(test_records, cfg.det, class_of_obj_id,
                          train=False)

    from self6dpp_tpu.parallel.mesh import (make_mesh, shard_batch,
                                            shard_state, step_shardings)

    mesh = make_mesh(cfg.dist) if len(jax.devices()) > 1 else None
    bs = max(cfg.solver.ims_per_batch // 4, 1)
    if mesh is not None:
        data_par = mesh.shape[cfg.dist.data_axis]
        bs = max(bs // data_par, 1) * data_par    # divisible batch
    x0 = np.zeros((bs, ycfg.input_size, ycfg.input_size, 3), np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(cfg.seed), x0)
    tx, _ = build_optimizer(cfg.solver,
                            flatten=cfg.dist.mesh_shape[-1] == 1)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx,
                               with_ema=False)
    if mesh is not None:
        state = shard_state(state, mesh, cfg.dist)

    if args.eval_only:
        ckpt = CheckpointManager(f"{cfg.output_dir}/{cfg.exp_name}/ckpt")
        state, _ = ckpt.resume_or_load(state, resume=True)
        ap, dets, _ = run_detector_eval(model, ycfg, state, test_set, bs,
                                        class_to_obj_id)
        logger.info("COCO AP: " + "  ".join(
            f"{k}={v * 100:.2f}" for k, v in ap.items()))
        out_path = args.out_det or \
            f"{cfg.output_dir}/{cfg.exp_name}/detections.json"
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        save_detections(out_path, dets)
        logger.info(f"wrote {out_path}")
        return

    train_dir = os.path.join(cfg.data.dataset_root, meta.name, "train")
    train_records = load_bop_split(train_dir)
    train_set = DetDataset(train_records, cfg.det, class_of_obj_id,
                           train=True, seed=cfg.seed)

    def train_step(state, batch, rng):
        x, tg, tv = batch

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x,
                train=True, mutable=["batch_stats"])
            ld = yolo_loss(outs, tg, tv, ycfg)
            return sum(jax.tree.leaves(ld)), (ld, mut["batch_stats"])

        (total, (ld, bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        return state, {"total_loss": total, **ld}

    if mesh is None:
        step = jax.jit(train_step, donate_argnums=(0,))
        to_device = lambda b: b
    else:
        st, data, repl = step_shardings(mesh, cfg.dist)
        step = jax.jit(train_step, in_shardings=(st, (data, data, data), repl),
                       donate_argnums=(0,))
        to_device = lambda b: tuple(jax.device_put(a, data) for a in b)

    def eval_fn(state):
        ap, _, _ = run_detector_eval(model, ycfg, state, test_set, bs,
                                     class_to_obj_id,
                                     max_images=args.eval_max_images)
        return {"avg": ap}

    do_train(cfg, state, step, train_set.train_batches(bs), to_device,
             eval_fn=eval_fn, resume=args.resume)


if __name__ == "__main__":
    main()
