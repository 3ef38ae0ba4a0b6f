"""Self6D++ Stage-II self-supervised training CLI
(reference core/self6dpp/main_self6dpp.py + train_self6dpp.sh).

Student GDRN is warm-started from a Stage-I checkpoint; the frozen/EMA
teacher produces pseudo geometry; pseudo poses come from a detections json
with pose_est/pose_refine (data_loader_self.py:764-877 contract).
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
    p.add_argument("--weights", default="", help="stage-I ckpt dir to warm-start")
    p.add_argument("--init-npz", default="",
                   help="converted reference weights (.npz) to overlay on "
                        "the fresh init before warm-start")
    p.add_argument("--det-file", required=False, default="",
                   help="detections json with pose_est/pose_refine")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--opts", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.engine import gdrn_engine as ge
    from self6dpp_tpu.engine import self_engine as se
    from self6dpp_tpu.engine.checkpoint import CheckpointManager
    from self6dpp_tpu.engine.trainer import do_train
    from self6dpp_tpu.engine.writers import setup_logger
    from self6dpp_tpu.models.lpips import LPIPS, load_lpips_params
    from tools.train_gdrn import build_dataset

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(os.path.join(cfg.output_dir, cfg.exp_name))

    ds, models, meta = build_dataset(cfg, train=True, det_file=args.det_file)
    model = ge.build_gdrn(cfg)

    def to_device(batch):
        db = {k: jnp.asarray(v) for k, v in batch.items() if k != "_valid"}
        db["mesh_verts"] = jnp.asarray(models.verts)
        db["mesh_faces"] = jnp.asarray(models.faces)
        db["mesh_colors"] = jnp.asarray(models.colors)
        db["roi_zoom_K"] = se.roi_zoom_K(db, cfg.model.input_res)
        return db

    batches = ds.batches(cfg.solver.ims_per_batch)
    batch0 = to_device(next(batches))
    state = ge.init_state(cfg, model, batch0)
    if args.init_npz:
        from self6dpp_tpu.engine.checkpoint import load_params_npz
        tree = load_params_npz(args.init_npz,
                               {"params": state.params,
                                "batch_stats": state.batch_stats},
                               strict=False)
        state = state.replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True),
                                    tree["params"]))
        logger.info(f"loaded converted weights from {args.init_npz}")
    if args.weights:
        st1 = CheckpointManager(args.weights)
        state, _ = st1.resume_or_load(state, resume=True)
        logger.info(f"warm-started student+teacher from {args.weights}")

    lpips = LPIPS()
    lp = load_lpips_params(os.path.join("weights", "lpips_alex.npz"))
    if lp is None:
        lp = jax.jit(lpips.init)(jax.random.PRNGKey(1), batch0["roi_img"],
                                 batch0["roi_img"])["params"]
        logger.warning("no converted LPIPS weights found; using random-init "
                       "AlexNet features")

    pose_step = jax.jit(se.make_self_train_step(cfg, model, lpips))
    geo_step = jax.jit(se.make_self_geo_train_step(cfg, model))
    geo_ratio = cfg.self_sup.geo_mode_ratio
    rng_np = np.random.default_rng(cfg.seed)

    def train_step(state, batch, rng):
        if geo_ratio > 0 and rng_np.random() < geo_ratio:
            return geo_step(state, batch, rng)
        return pose_step(state, lp, batch, rng)

    do_train(cfg, state, train_step, batches, to_device, resume=args.resume)


if __name__ == "__main__":
    main()
