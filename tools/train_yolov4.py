"""YOLOv4 detector train/test CLI (reference det/yolov4/main_yolov4.py).

Test mode writes the detection json contract consumed by GDRN/self6dpp
loaders (core/utils/dataset_utils.py:120): per scene_im_id a list of
{obj_id, bbox_est [x,y,w,h], score, time}.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--out-det", default="", help="output detection json")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("--width", type=float, default=1.0)
    p.add_argument("--depth", type=float, default=1.0)
    p.add_argument("--opts", nargs="*", default=[])
    from self6dpp_tpu.parallel.mesh import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, float, tuple]:
    import cv2
    h, w = img.shape[:2]
    r = size / max(h, w)
    nh, nw = int(h * r), int(w * r)
    out = np.zeros((size, size, 3), np.float32)
    out[:nh, :nw] = cv2.resize(img, (nw, nh))
    return out, r, (0, 0)


def main():
    args = parse_args()
    # multi-host: must run before any other JAX backend use
    from self6dpp_tpu.parallel.mesh import maybe_init_distributed_from_args
    maybe_init_distributed_from_args(args)
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.data.bop import load_bop_split, save_detections
    from self6dpp_tpu.data.ref import get_meta
    from self6dpp_tpu.engine.checkpoint import CheckpointManager
    from self6dpp_tpu.engine.optim import build_optimizer
    from self6dpp_tpu.engine.train_state import create_train_state
    from self6dpp_tpu.engine.trainer import do_train
    from self6dpp_tpu.engine.writers import setup_logger
    from self6dpp_tpu.models.yolo import (YOLOv4, YoloConfig,
                                          decode_predictions,
                                          non_max_suppression, yolo_loss)

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(os.path.join(cfg.output_dir, cfg.exp_name))
    meta = get_meta(cfg.data.test_datasets[0])
    ycfg = YoloConfig(num_classes=meta.num_objects,
                      input_size=args.input_size,
                      width_multiple=args.width, depth_multiple=args.depth)
    model = YOLOv4(cfg=ycfg)

    import cv2
    split = "test" if args.eval_only else "train"
    split_dir = os.path.join(cfg.data.dataset_root, meta.name, split)
    records = load_bop_split(split_dir)

    max_objs = 16

    def make_batch(recs):
        imgs, targets, tvalid = [], [], []
        for r in recs:
            img = cv2.imread(r.file_name)[..., ::-1].astype(np.float32) / 255.0
            lb, ratio, _ = letterbox(img, ycfg.input_size)
            imgs.append(lb)
            tg = np.zeros((max_objs, 5), np.float32)
            tv = np.zeros((max_objs,), bool)
            for i, inst in enumerate(r.instances[:max_objs]):
                b = inst.bbox_visib * ratio
                cls = meta.objects.index(meta.id2obj[inst.obj_id])
                tg[i] = [cls, (b[0] + b[2]) / 2, (b[1] + b[3]) / 2,
                         b[2] - b[0], b[3] - b[1]]
                tv[i] = True
            targets.append(tg)
            tvalid.append(tv)
        return (jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(targets)),
                jnp.asarray(np.stack(tvalid)))

    from self6dpp_tpu.parallel.mesh import (make_mesh, shard_batch,
                                            shard_state, step_shardings)

    mesh = make_mesh(cfg.dist) if len(jax.devices()) > 1 else None
    bs = max(cfg.solver.ims_per_batch // 4, 1)
    if mesh is not None:
        data_par = mesh.shape[cfg.dist.data_axis]
        bs = max(bs // data_par, 1) * data_par    # divisible batch
    x0, t0_, v0 = make_batch(records[:bs])
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

        @jax.jit
        def infer(state, x):
            outs = model.apply({"params": state.params,
                                "batch_stats": state.batch_stats}, x)
            return decode_predictions(outs, ycfg)

        dets = {}
        for i in range(0, len(records), bs):
            recs = records[i : i + bs]
            x, _, _ = make_batch(recs)
            t0 = time.perf_counter()
            pred = np.asarray(infer(state, x))
            dt = (time.perf_counter() - t0) / len(recs)
            nms = non_max_suppression(pred, ycfg.conf_thresh, ycfg.iou_thresh)
            for r, d in zip(recs, nms):
                img = cv2.imread(r.file_name)
                ratio = ycfg.input_size / max(img.shape[:2])
                rows = []
                for x1, y1, x2, y2, score, cls in d:
                    x1, y1, x2, y2 = [v / ratio for v in (x1, y1, x2, y2)]
                    rows.append({
                        "obj_id": meta.obj2id[meta.objects[int(cls)]],
                        "bbox_est": [float(x1), float(y1),
                                     float(x2 - x1), float(y2 - y1)],
                        "score": float(score), "time": dt})
                dets[r.scene_im_id] = rows
        out_path = args.out_det or \
            f"{cfg.output_dir}/{cfg.exp_name}/detections.json"
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        save_detections(out_path, dets)
        logger.info(f"wrote {out_path}")
        return

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

    rng_np = np.random.default_rng(cfg.seed)

    def batches():
        while True:
            order = rng_np.permutation(len(records))
            for i in range(0, len(records) - bs + 1, bs):
                yield make_batch([records[j] for j in order[i : i + bs]])

    if mesh is None:
        step = jax.jit(train_step, donate_argnums=(0,))
        to_device = lambda b: b
    else:
        st, data, repl = step_shardings(mesh, cfg.dist)
        step = jax.jit(train_step, in_shardings=(st, (data, data, data), repl),
                       donate_argnums=(0,))
        to_device = lambda b: tuple(jax.device_put(a, data) for a in b)
    do_train(cfg, state, step, batches(), to_device, resume=args.resume)


if __name__ == "__main__":
    main()
