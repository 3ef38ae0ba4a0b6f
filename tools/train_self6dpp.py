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
    from self6dpp_tpu.parallel.mesh import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host: must run before any other JAX backend use
    from self6dpp_tpu.parallel.mesh import maybe_init_distributed_from_args
    maybe_init_distributed_from_args(args)
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.engine import gdrn_engine as ge
    from self6dpp_tpu.engine import self_engine as se
    from self6dpp_tpu.engine.checkpoint import CheckpointManager
    from self6dpp_tpu.engine.trainer import do_train
    from self6dpp_tpu.engine.writers import setup_logger
    from self6dpp_tpu.models.lpips import LPIPS, load_lpips_params
    from tools.train_gdrn import build_dataset

    from self6dpp_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(os.path.join(cfg.output_dir, cfg.exp_name))

    ds, models, meta = build_dataset(cfg, train=True, det_file=args.det_file)
    model = ge.build_gdrn(cfg)
    mesh = make_mesh(cfg.dist) if len(jax.devices()) > 1 else None

    def to_device(batch):
        from self6dpp_tpu.engine.evaluator import HOST_ONLY_KEYS
        db = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in HOST_ONLY_KEYS}
        db["mesh_verts"] = jnp.asarray(models.verts)
        db["mesh_faces"] = jnp.asarray(models.faces)
        db["mesh_colors"] = jnp.asarray(models.colors)
        db["mesh_normals"] = jnp.asarray(models.normals)
        db["mesh_fps"] = jnp.asarray(models.fps_points)
        if models.uvs is not None:
            # textured models (ycbv): stage-II renders via per-pixel UV
            # texture sampling instead of vertex colors
            db["mesh_uv"] = jnp.asarray(models.uvs)
            db["mesh_texture"] = jnp.asarray(models.textures)
        db["roi_zoom_K"] = se.roi_zoom_K(db, cfg.model.input_res, cfg.model.output_res)
        if mesh is not None:
            db = shard_batch(db, mesh, cfg.dist)
        return db

    batches = ds.batches(cfg.solver.ims_per_batch)
    batch0 = to_device(next(batches))
    state = ge.init_state(cfg, model, batch0, mesh=mesh)
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
        # weights-only: restoring stage-I opt_state/step would replay a 100k
        # schedule count into the short stage-II run (LR annealed to zero)
        st1 = CheckpointManager(args.weights)
        state = st1.load_weights(state)
        logger.info(f"warm-started student+teacher weights from {args.weights}")

    lpips = LPIPS()
    lp = load_lpips_params(os.path.join("weights", "lpips_alex.npz"))
    if lp is None:
        lp = jax.jit(lpips.init)(jax.random.PRNGKey(1), batch0["roi_img"],
                                 batch0["roi_img"])["params"]
        logger.warning("no converted LPIPS weights found; using random-init "
                       "AlexNet features")

    ss = cfg.self_sup
    # EMA teacher refresh cadence: UPDATE_FREQ epochs -> steps (reference
    # self_engine.py:674-682)
    iters_per_epoch = max(1, len(ds) // cfg.solver.ims_per_batch)
    ema_every = (max(1, ss.teacher_update_freq) * iters_per_epoch
                 if ss.teacher_update_freq > 0 else 1)

    # optional DeepIM refiner in the loop (main_self6dpp.py:231-245)
    refiner = None
    if ss.refine_with_deepim:
        assert ss.refiner_config, \
            "self_sup.refine_with_deepim requires self_sup.refiner_config"
        from self6dpp_tpu.engine import deepim_engine as de
        rcfg = load_config(ss.refiner_config)
        dmodel = de.build_deepim(rcfg)
        dinit = {
            "init_rot": batch0["gt_rot"], "init_trans": batch0["gt_trans"],
            "K": batch0["roi_zoom_K"],
        }
        dstate = de.init_state(rcfg, dmodel, dinit)
        if ss.refiner_weights.endswith(".npz"):
            from self6dpp_tpu.engine.checkpoint import load_params_npz
            tree = load_params_npz(
                ss.refiner_weights,
                {"params": dstate.params, "batch_stats": dstate.batch_stats},
                strict=False)
            dstate = dstate.replace(params=tree["params"],
                                    batch_stats=tree["batch_stats"])
        elif ss.refiner_weights:
            dstate = CheckpointManager(ss.refiner_weights).load_weights(dstate)
        else:
            logger.warning("refine_with_deepim without refiner_weights: "
                           "using a random-init refiner (smoke mode)")
        dvars = {"params": dstate.params}
        if dstate.batch_stats:
            dvars["batch_stats"] = dstate.batch_stats
        refiner = (dmodel, dvars, rcfg)
        logger.info(f"DeepIM refiner in the loop: {ss.refiner_config}")

    pose_step = se.jit_self_train_step(
        cfg, model, lpips, refiner=refiner, ema_update_every=ema_every,
        mesh=mesh)
    geo_step = se.jit_self_geo_train_step(
        cfg, model, ema_update_every=ema_every, mesh=mesh)
    rng_np = np.random.default_rng(cfg.seed)

    # TRAIN2 synthetic-supervised interleave (self_engine.py:409-421)
    synsup_step = None
    batches2 = None
    train2_ratio = cfg.data.train2_ratio
    if train2_ratio > 0 and cfg.data.train2_datasets:
        ds2, _, _ = build_dataset(cfg, train=True,
                                  dataset_names=cfg.data.train2_datasets)
        batches2 = ds2.batches(cfg.solver.ims_per_batch)
        synsup_step = se.jit_synsup_train_step(
            cfg, model, ema_update_every=ema_every, mesh=mesh)
        logger.info(f"TRAIN2 interleave: ratio={train2_ratio} "
                    f"datasets={cfg.data.train2_datasets}")

    next_mode = se.make_mode_picker(ss, rng_np)

    def mixed_batches():
        """Per-iteration choice of syn-sup vs self batch and pose/geo mode
        (self_engine.py:409-421 + data_loader_self.py:742-748 step());
        marker keys route the jitted step."""
        while True:
            if synsup_step is not None and rng_np.random() < train2_ratio:
                yield dict(next(batches2), _synsup=np.int32(1))
            elif next_mode() == "geo":
                yield dict(next(batches), _geo=np.int32(1))
            else:
                yield next(batches)

    def train_step(state, batch, rng):
        if "_synsup" in batch:
            return synsup_step(state, batch, rng)
        if "_geo" in batch:
            return geo_step(state, batch, rng)
        return pose_step(state, lp, batch, rng)

    # TB image grids of [real ROI | student render | teacher vis-mask]
    # (reference writes gt/ren/pseudo grids, self_engine.py:713-746)
    vis_fn = None
    if cfg.vis_period > 0:
        from self6dpp_tpu.losses.mask_losses import get_mask_prob

        @jax.jit
        def _vis_fwd(state, batch):
            variables = {"params": state.params}
            tvars = {"params": state.ema_params}
            if state.batch_stats:
                variables["batch_stats"] = tvars["batch_stats"] = \
                    state.batch_stats
            out = model.apply(variables, *ge.model_inputs(batch), train=False)
            ren = se.render_student_pose(cfg, batch, out["rot"], out["trans"])
            tout = model.apply(tvars, *ge.model_inputs(batch), train=False,
                               forward_mode="geo")
            tmask = get_mask_prob(tout["mask_logits"],
                                  cfg.model.loss.mask_loss_type)[..., 0]
            return ren["color"], tmask

        def vis_fn(state, batch, storage):
            color, tmask = _vis_fwd(state, batch)
            color = np.asarray(color, dtype=np.float32)
            tmask = np.asarray(tmask, dtype=np.float32)
            k = min(4, color.shape[0])
            s = cfg.model.input_res
            import cv2
            rows = []
            for i in range(k):
                tm = cv2.resize(tmask[i], (s, s),
                                interpolation=cv2.INTER_NEAREST)
                rows.append(np.concatenate(
                    [np.asarray(batch["roi_img"][i], dtype=np.float32),
                     color[i], np.repeat(tm[..., None], 3, -1)], axis=1))
            grid = np.clip(np.concatenate(rows, axis=0), 0, 1)
            storage.tb.add_image("self/roi_ren_pseudomask", grid)

    # periodic in-train eval of the EMA TEACHER — the canonical stage-II
    # model the reference checkpoints and evaluates (self_engine.py:310-314,
    # eval tables to TB :694-698)
    eval_fn = None
    if cfg.test.eval_period > 0:
        from self6dpp_tpu.engine.evaluator import PoseEvaluator, run_inference
        ds_t, models_t, meta_t = build_dataset(cfg, train=False,
                                               det_file=args.det_file)
        estep = ge.jit_eval_step(cfg, model, mesh=mesh)

        def eval_fn(st):
            teacher = st.replace(params=st.ema_params)
            ev = PoseEvaluator(models_t, meta_t)
            run_inference(estep, teacher,
                          ds_t.batches(cfg.solver.ims_per_batch), ev,
                          to_device=to_device)
            return ev.evaluate()

    do_train(cfg, state, train_step, mixed_batches(), to_device,
             eval_fn=eval_fn, vis_fn=vis_fn, resume=args.resume)


if __name__ == "__main__":
    main()
