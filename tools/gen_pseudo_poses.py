"""Offline pseudo-label pipeline for Stage II.

Parity target: the reference's pseudo-label tools
(core/self6dpp/tools/lm/lm_pbr_so_mlBCE_*.py: run stage-I GDRN on the real
training images with detected boxes -> pose_est; optionally refine with
DeepIM -> pose_refine; merge into the detections json consumed by
data_loader_self.py:764-877).

Usage:
  python tools/gen_pseudo_poses.py --config configs/gdrn/lm_base.py \
      --gdrn-ckpt output/gdrn_lm_base/ckpt --det-file dets.json \
      [--deepim-config configs/deepim/lm.py --deepim-ckpt ...] \
      --out pseudo.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--gdrn-ckpt", required=True)
    p.add_argument("--det-file", required=True)
    p.add_argument("--deepim-config", default="")
    p.add_argument("--deepim-ckpt", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--opts", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.data.bop import save_detections
    from self6dpp_tpu.engine import gdrn_engine as ge
    from self6dpp_tpu.engine.checkpoint import CheckpointManager
    from self6dpp_tpu.engine.writers import setup_logger
    from tools.train_gdrn import build_dataset

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(None)

    ds, models, meta = build_dataset(cfg, train=False, det_file=args.det_file)
    ds.train = False
    model = ge.build_gdrn(cfg)
    bs = cfg.solver.ims_per_batch

    def to_device(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "_valid"}

    batch0 = to_device(next(ds.batches(bs, infinite=True)))
    state = ge.init_state(cfg, model, batch0)
    state, _ = CheckpointManager(args.gdrn_ckpt).resume_or_load(state, True)
    eval_step = ge.jit_eval_step(cfg, model)

    refine_fn = None
    if args.deepim_config:
        from self6dpp_tpu.engine import deepim_engine as de
        dcfg = apply_overrides(load_config(args.deepim_config), [])
        dmodel = de.build_deepim(dcfg)
        dbatch0 = {
            "init_rot": batch0["gt_rot"], "init_trans": batch0["gt_trans"],
            "K": batch0["roi_cam"],
        }
        dstate = de.init_state(dcfg, dmodel, dbatch0)
        dstate, _ = CheckpointManager(args.deepim_ckpt).resume_or_load(dstate, True)
        refine_step = jax.jit(de.make_eval_step(dcfg, dmodel))

        def refine_fn(batch, rot, trans):
            rb = {
                "obs_img": batch["roi_img"], "K": batch["roi_cam"],
                "obs_box": jnp.concatenate(
                    [batch["roi_center"] - batch["roi_wh"] / 2,
                     batch["roi_center"] + batch["roi_wh"] / 2], axis=1),
                "verts": jnp.asarray(models.verts)[batch["roi_cls"]],
                "faces": jnp.asarray(models.faces)[batch["roi_cls"]],
                "colors": jnp.asarray(models.colors)[batch["roi_cls"]],
                "init_rot": rot, "init_trans": trans,
                "roi_cls": batch["roi_cls"],
            }
            out = refine_step(dstate, rb)
            return out["rot"], out["trans"]

    dets: dict[str, list] = {}
    for raw in ds.batches(bs):
        b = to_device(raw)
        out = eval_step(state, b)
        rot, trans = out["rot"], out["trans"]
        rot_r, trans_r = (refine_fn(b, rot, trans) if refine_fn
                          else (None, None))
        valid = raw.get("_valid", np.ones(len(raw["gt_rot"]), np.int32))
        for i in range(len(valid)):
            if not valid[i]:
                continue
            key = f"{int(raw['scene_im_id_scene'][i])}/{int(raw['scene_im_id_im'][i])}"
            cx, cy = raw["roi_center"][i]
            bw, bh = raw["roi_wh"][i]
            entry = {
                "obj_id": int(raw["obj_id"][i]),
                "bbox_est": [float(cx - bw / 2), float(cy - bh / 2),
                             float(bw), float(bh)],
                "score": float(raw.get("score", np.ones(len(valid)))[i]),
                "pose_est": np.concatenate(
                    [np.asarray(rot[i]), np.asarray(trans[i])[:, None]],
                    axis=1).tolist(),
            }
            if rot_r is not None:
                entry["pose_refine"] = np.concatenate(
                    [np.asarray(rot_r[i]), np.asarray(trans_r[i])[:, None]],
                    axis=1).tolist()
            dets.setdefault(key, []).append(entry)

    save_detections(args.out, dets)
    logger.info(f"wrote pseudo poses for {len(dets)} images -> {args.out}")


if __name__ == "__main__":
    main()
